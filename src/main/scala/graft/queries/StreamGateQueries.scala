package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Tables
import graft.sources.hub.MemHub
import graft.streaming.{Rolling, Sessionize, StreamDedup, Timestamps}

/** Value gates for the streaming-only surfaces (rollingAggregate,
  * timestamp policies, streaming dedup, mapUsingService): each runs the
  * real Structured Streaming query over a pre-seeded log on a FIXED epoch
  * schedule (maxPerTrigger rate limit + AvailableNow drain — same batches
  * every run), accumulates the update stream via foreachBatch, and
  * returns the FINAL table; DuckDB pins it against the batch formulation
  * over the same events. A `multi_epoch` column (pinned TRUE) proves the
  * value came through several incremental epochs, not one batch in
  * disguise. Stream execution is once per (query, sf dir) — the
  * ivf_build amortization precedent — so Verify/Bench reruns read the
  * settled result. */
object StreamGateQueries {

  private val ran = new scala.collection.concurrent.TrieMap[String, DataFrame]()

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Seed a pulsar-profile topic: key = event_type, value = int64
    * event_id (big-endian — the typed codec), eventTime = ts. `copies`
    * plants exact duplicates for the dedup gate. */
  private def seedEvents(s: SparkSession, dir: String, uri: String, copies: Int): Unit = {
    val rows = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), unix_millis(col("ts")))
      .orderBy(col("event_id")).collect()
    (1 to copies).foreach { _ =>
      MemHub.publish(uri, "ev", rows.iterator.map { r =>
        val bb = java.nio.ByteBuffer.allocate(8).putLong(r.getLong(0))
        (r.getString(1), Map.empty[String, String], r.getLong(2), bb.array())
      })
    }
  }

  private def eventStream(s: SparkSession, uri: String, maxPerTrigger: Long): DataFrame =
    s.readStream.format("graft-topic")
      .option("profile", "pulsar").option("uri", uri).option("topics", "ev")
      .option("schema", "int64").option("maxPerTrigger", maxPerTrigger.toString)
      .load()

  /** Drain `stream` through foreachBatch on the fixed schedule; `merge`
    * folds each update batch into the accumulator. Returns epochs seen.
    * `cpKey` must be unique per (query, sf dir) — the callers pass their
    * `ran` cache key — because a reused checkpoint would RESUME from the
    * previous dir's committed offsets against a different topic (a warm
    * run at sf0.001 would silently eat the head of the sf0.1 stream). */
  /** Start-and-await with a ZERO-INTAKE guard: every gate publishes a
    * non-empty fixture before starting, so an AvailableNow run that
    * commits zero batches is a snapshot flake (observed once in-session:
    * q163 drained nothing inside a 200-query Verify where the identical
    * deterministic replay passed), not a result. A zero-batch run has no
    * side effects — no epoch callbacks fired — so ONE retry on a fresh
    * checkpoint is sound; still zero → throw loudly instead of returning
    * an empty (silently wrong) gate result. */
  private[graft] def awaitIntake(label: String,
      start: String => org.apache.spark.sql.streaming.StreamingQuery,
      cp: String, intake: () => Long): Unit = {
    start(cp).awaitTermination()
    if (intake() == 0L) {
      System.err.println(
        s"[graft] $label: AvailableNow drained zero batches — retrying on a fresh checkpoint")
      start(s"$cp-retry").awaitTermination()
      if (intake() == 0L)
        throw new IllegalStateException(s"$label: stream intake is zero " +
          "after a fresh-checkpoint retry — offset snapshot or publish broken")
    }
  }

  private def drain(stream: DataFrame, mode: String, cpKey: String)(
      merge: (Long, Array[Row]) => Unit): Long = {
    var epochs = 0L
    val cp = s"${System.getProperty("java.io.tmpdir")}/graft-sgate-cp-" +
      s"${java.lang.ProcessHandle.current().pid()}-" +
      java.lang.Integer.toHexString(cpKey.hashCode)
    awaitIntake(s"drain:$cpKey", cpv => stream.writeStream
      .outputMode(mode)
      .option("checkpointLocation", cpv)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val rows = batch.collect()
        synchronized { epochs = math.max(epochs, id + 1); merge(id, rows) }
      }
      .trigger(Trigger.AvailableNow())
      .start(), cp, () => synchronized { epochs })
    synchronized { epochs }
  }

  /** T — rollingAggregate (update-mode keyed streaming aggregate): the
    * final per-key rolling value after draining the log == the batch
    * aggregate DuckDB computes. */
  val qStreamRolling = QueryDef(
    "q98_stream_rolling",
    (s, dir) => ran.getOrElseUpdate(s"$dir/rolling", {
      import s.implicits._
      val uri = s"hub:$dir/sgate_rolling"
      seedEvents(s, dir, uri, copies = 1)
      val n = t(s, dir, "events").count()
      val latest = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
      val rolling = Rolling.rollingAggregateByKey(
        eventStream(s, uri, math.max(1, n / 7))
          .select(col("key").as("event_type"), col("value").as("event_id")),
        Seq("event_type"),
        count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
      val epochs = drain(rolling, "update", s"$dir/rolling") { (_, rows) =>
        rows.foreach(r => latest(r.getString(0)) = (r.getLong(1), r.getLong(2)))
      }
      latest.toSeq.map { case (k, (c, sm)) => (k, c, sm, epochs > 1) }
        .toDF("event_type", "n", "id_sum", "multi_epoch")
        .orderBy(col("event_type"))
    }),
    Some("""SELECT event_type, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum, TRUE AS multi_epoch
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** T — streaming dedup with bounded state: the log carries every event
    * TWICE; dropDuplicatesWithinWatermark emits each exactly once. */
  val qStreamDedup = QueryDef(
    "q99_stream_dedup",
    (s, dir) => ran.getOrElseUpdate(s"$dir/dedup", {
      import s.implicits._
      val uri = s"hub:$dir/sgate_dedup"
      seedEvents(s, dir, uri, copies = 2)
      val n = t(s, dir, "events").count()
      val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
      // dedupWithinWatermark owns the watermark (the withNativeTimestamps
      // policy composed on top would redefine it — disallowed)
      val deduped = StreamDedup.dedupWithinWatermark(
        eventStream(s, uri, math.max(1, 2 * n / 7)),
        "eventTime", "30 days", Seq("value"))
      val epochs = drain(deduped.select(col("value")), "append", s"$dir/dedup") { (_, rows) =>
        seen ++= rows.map(_.getLong(0))
      }
      Seq((seen.size.toLong, seen.distinct.size.toLong, seen.sum, epochs > 1))
        .toDF("n", "n_distinct", "id_sum", "multi_epoch")
    }),
    Some("""SELECT COUNT(*) AS n, COUNT(*) AS n_distinct,
        CAST(SUM(event_id) AS BIGINT) AS id_sum, TRUE AS multi_epoch
      FROM events"""))

  /** T — timestamp policies: addTimestamps derives event time + watermark
    * (the reference's addTimestamps(fn, lag)); 6-hour tumbling windows
    * aggregated in update mode settle to the batch answer. */
  val qStreamWindow = QueryDef(
    "q100_stream_window",
    (s, dir) => ran.getOrElseUpdate(s"$dir/window", {
      import s.implicits._
      val uri = s"hub:$dir/sgate_window"
      seedEvents(s, dir, uri, copies = 1)
      val n = t(s, dir, "events").count()
      val latest = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Long)]
      val windowed = Timestamps.addTimestamps(
          eventStream(s, uri, math.max(1, n / 7)), col("eventTime"), 86400000L * 30)
        .groupBy(window(col("event_time"), "6 hours"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("id_sum"))
        .select(unix_millis(col("window.start")).as("w"), col("n"), col("id_sum"))
      val epochs = drain(windowed, "update", s"$dir/window") { (_, rows) =>
        rows.foreach(r => latest(r.getLong(0)) = (r.getLong(1), r.getLong(2)))
      }
      latest.toSeq.map { case (w, (c, sm)) => (w / 1000, c, sm, epochs > 1) }
        .toDF("w_start_s", "n", "id_sum", "multi_epoch")
        .orderBy(col("w_start_s"))
    }),
    Some("""SELECT CAST(FLOOR(epoch(ts) / 21600) * 21600 AS BIGINT) AS w_start_s,
        COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS id_sum, TRUE AS multi_epoch
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** T — mapUsingService: the per-partition service pattern (one
    * MessageDigest per partition, iterator-streamed) value-gated against
    * DuckDB's md5 over the same documents. */
  val qMapService = QueryDef(
    "q101_map_service",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
      graft.streaming.ServiceMap.mapUsingService(
          docs, () => java.security.MessageDigest.getInstance("MD5")) {
        (md, r) =>
          (r._1, md.digest(r._2.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      }.toDF("doc_id", "md5_hex").orderBy(col("doc_id"))
    },
    Some("SELECT doc_id, md5(text) AS md5_hex FROM documents ORDER BY doc_id"))

  /** T — flagship keyed-state surface: flatMapGroupsWithState
    * sessionization over the event stream == the batch gap-island
    * formulation DuckDB computes. The feed is published in (ts, event_id)
    * order (so the event-time watermark never drops a row), and one
    * SENTINEL event per user lands 3 gaps after the corpus end: every
    * real session is force-closed through the DATA path (gap-break on the
    * sentinel's arrival), never through the end-of-stream timeout whose
    * firing under AvailableNow is a scheduler detail. Sentinel sessions
    * themselves start after the corpus and are filtered out. */
  val qStreamSessions = QueryDef(
    "q102_stream_sessions",
    (s, dir) => ran.getOrElseUpdate(s"$dir/sessions", {
      import s.implicits._
      val gapMs = 10L * 60 * 1000
      val uri = s"hub:$dir/sgate_sessions"
      val evs = t(s, dir, "events")
        .select(col("user_id").cast("long"), unix_millis(col("ts")).as("ms"),
          col("event_id"))
        .orderBy(col("ms"), col("event_id")).collect()
      val maxMs = evs.iterator.map(_.getLong(1)).max
      val sentinels = evs.iterator.map(_.getLong(0)).toSet.toSeq.sorted
        .map(u => (u, maxMs + 3 * gapMs))
      MemHub.publish(uri, "ev",
        (evs.iterator.map(r => (r.getLong(0), r.getLong(1))) ++ sentinels.iterator)
          .map { case (u, ms) =>
            val bb = java.nio.ByteBuffer.allocate(8).putLong(u)
            (u.toString, Map.empty[String, String], ms, bb.array())
          })
      val sessions = Sessionize.sessions(
        eventStream(s, uri, math.max(1, (evs.length + sentinels.size) / 7))
          .select(col("value").as("user_id"), col("eventTime").as("ts")),
        gapMs).toDF()
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      val epochs = drain(sessions, "append", s"$dir/sessions") { (_, rows) =>
        out ++= rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      }
      out.toSeq.filter(_._2 <= maxMs) // drop the sentinel-only sessions
        .map { case (u, st, en, n) => (u, st, en, n, epochs > 1) }
        .toDF("user_id", "start_ms", "end_ms", "n_events", "multi_epoch")
        .orderBy(col("user_id"), col("start_ms"))
    }),
    Some("""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id FROM events),
      o AS (SELECT user_id, ms, event_id,
              lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
            FROM e),
      f AS (SELECT user_id, ms, event_id,
              CASE WHEN prev IS NULL OR ms - prev > 600000 THEN 1 ELSE 0 END AS newf
            FROM o),
      s AS (SELECT user_id, ms,
              SUM(newf) OVER (PARTITION BY user_id ORDER BY ms, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
            FROM f)
      SELECT user_id, MIN(ms) AS start_ms, MAX(ms) AS end_ms,
             COUNT(*) AS n_events, TRUE AS multi_epoch
      FROM s GROUP BY user_id, sid ORDER BY user_id, start_ms"""))

  /** T — stream-stream interval join (the last spec-only streaming
    * surface): two independent scans of the user-keyed event log (even
    * event_ids vs odd), watermarked on both sides, joined on user within
    * ±10 minutes. Append mode emits each qualifying pair exactly once;
    * the accumulated pair set must equal DuckDB's batch theta-join over
    * the same events bit-for-bit. */
  val qStreamJoin = QueryDef(
    "q122_stream_join",
    (s, dir) => ran.getOrElseUpdate(s"$dir/sjoin", {
      import s.implicits._
      val uri = s"hub:$dir/sgate_sjoin"
      val evs = t(s, dir, "events")
        .select(col("user_id").cast("long"), col("event_id"), unix_millis(col("ts")))
        .orderBy(col("event_id")).collect()
      MemHub.publish(uri, "ev", evs.iterator.map { r =>
        val bb = java.nio.ByteBuffer.allocate(8).putLong(r.getLong(1))
        (r.getLong(0).toString, Map.empty[String, String], r.getLong(2), bb.array())
      })
      val per = math.max(1L, evs.length / 7L)
      val a = eventStream(s, uri, per)
        .filter(pmod(col("value"), lit(2)) === 0)
        .select(col("key").cast("long").as("user_a"), col("value").as("a_id"),
          col("eventTime").as("a_ts"))
        .withWatermark("a_ts", "30 days")
      val b = eventStream(s, uri, per)
        .filter(pmod(col("value"), lit(2)) === 1)
        .select(col("key").cast("long").as("user_b"), col("value").as("b_id"),
          col("eventTime").as("b_ts"))
        .withWatermark("b_ts", "30 days")
      val joined = a.join(b, expr(
          "user_a = user_b AND b_ts BETWEEN a_ts - INTERVAL 10 MINUTES " +
            "AND a_ts + INTERVAL 10 MINUTES"))
        .select(col("user_a").as("user_id"), col("a_id"), col("b_id"))
      val pairs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val epochs = drain(joined, "append", s"$dir/sjoin") { (_, rows) =>
        pairs ++= rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      }
      pairs.toSeq.map { case (u, ai, bi) => (u, ai, bi, epochs > 1) }
        .toDF("user_id", "a_id", "b_id", "multi_epoch")
        .orderBy(col("user_id"), col("a_id"), col("b_id"))
    }),
    Some("""SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
        TRUE AS multi_epoch
      FROM events a JOIN events b ON a.user_id = b.user_id
      WHERE a.event_id % 2 = 0 AND b.event_id % 2 = 1
        AND epoch_ms(b.ts) BETWEEN epoch_ms(a.ts) - 600000
                               AND epoch_ms(a.ts) + 600000
      ORDER BY a.user_id, a_id, b_id"""))

  /** T — stream-static lookup enrichment (the reference's mapUsingIMap /
    * hash-join-enrichment shape): every streamed event picks up its
    * type's dimension attribute (min event_id — a per-key constant) from
    * a broadcast static snapshot; the drained rollup must equal DuckDB's
    * batch join over the same events. */
  val qStreamEnrich = QueryDef(
    "q126_stream_enrich",
    (s, dir) => ran.getOrElseUpdate(s"$dir/enrich", {
      import s.implicits._
      val uri = s"hub:$dir/sgate_enrich"
      seedEvents(s, dir, uri, copies = 1)
      val n = t(s, dir, "events").count()
      val dim = t(s, dir, "events")
        .groupBy(col("event_type")).agg(min(col("event_id")).as("min_id"))
      val enriched = eventStream(s, uri, math.max(1, n / 7))
        .select(col("key").as("event_type"), col("value").as("event_id"))
        .join(broadcast(dim), "event_type")
      val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      val epochs = drain(enriched, "append", s"$dir/enrich") { (_, rows) =>
        acc ++= rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      }
      acc.groupBy(r => (r._1, r._3)).toSeq
        .map { case ((ty, mi), rs) =>
          (ty, rs.size.toLong, mi, rs.map(_._2).sum, epochs > 1)
        }
        .toDF("event_type", "n", "min_id", "id_sum", "multi_epoch")
        .orderBy(col("event_type"))
    }),
    Some("""SELECT event_type, COUNT(*) AS n,
        CAST(MIN(event_id) AS BIGINT) AS min_id,
        CAST(SUM(event_id) AS BIGINT) AS id_sum, TRUE AS multi_epoch
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** T — stream-stream LEFT OUTER interval join: the watermark-driven
    * semantics the inner join (q122) doesn't exercise — an unmatched left
    * event emits its null row only once BOTH watermarks prove no future
    * match can arrive. One far-future sentinel per side (an unmatchable
    * user) pushes the final watermark past every real window under
    * AvailableNow, so every unmatched row is forced out through the DATA
    * path; sentinel rows are filtered from the result. */
  val qStreamOuterJoin = QueryDef(
    "q132_stream_outer_join",
    (s, dir) => ran.getOrElseUpdate(s"$dir/souter", {
      import s.implicits._
      val uri = s"hub:$dir/sgate_souter"
      val evs = t(s, dir, "events")
        .select(col("user_id").cast("long"), col("event_id"), unix_millis(col("ts")))
        .orderBy(col("event_id")).collect()
      val maxMs = evs.iterator.map(_.getLong(2)).max
      val sentinelUser = 999999999L
      val sentinels = Seq( // one per parity side, far past every window
        (sentinelUser, 1000000000L, maxMs + 40L * 24 * 3600 * 1000),
        (sentinelUser, 1000000001L, maxMs + 40L * 24 * 3600 * 1000))
      MemHub.publish(uri, "ev",
        (evs.iterator.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ++
          sentinels.iterator).map { case (u, id, ms) =>
          val bb = java.nio.ByteBuffer.allocate(8).putLong(id)
          (u.toString, Map.empty[String, String], ms, bb.array())
        })
      val per = math.max(1L, (evs.length + 2L) / 7L)
      val a = eventStream(s, uri, per)
        .filter(pmod(col("value"), lit(2)) === 0)
        .select(col("key").cast("long").as("user_a"), col("value").as("a_id"),
          col("eventTime").as("a_ts"))
        .withWatermark("a_ts", "30 days")
      val b = eventStream(s, uri, per)
        .filter(pmod(col("value"), lit(2)) === 1)
        .select(col("key").cast("long").as("user_b"), col("value").as("b_id"),
          col("eventTime").as("b_ts"))
        .withWatermark("b_ts", "30 days")
      val joined = a.join(b, expr(
          "user_a = user_b AND b_ts BETWEEN a_ts - INTERVAL 10 MINUTES " +
            "AND a_ts + INTERVAL 10 MINUTES"), "left_outer")
        .select(col("user_a").as("user_id"), col("a_id"), col("b_id"))
      val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Option[Long])]
      val epochs = drain(joined, "append", s"$dir/souter") { (_, rows) =>
        acc ++= rows.map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
      }
      acc.toSeq.filter(_._1 != sentinelUser)
        .map { case (u, ai, bi) => (u, ai, bi, epochs > 1) }
        .toDF("user_id", "a_id", "b_id", "multi_epoch")
        .orderBy(col("user_id"), col("a_id"), col("b_id").asc_nulls_first)
    }),
    Some("""SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
        TRUE AS multi_epoch
      FROM (SELECT * FROM events WHERE event_id % 2 = 0) a
      LEFT JOIN (SELECT * FROM events WHERE event_id % 2 = 1) b
        ON a.user_id = b.user_id
        AND epoch_ms(b.ts) BETWEEN epoch_ms(a.ts) - 600000
                               AND epoch_ms(a.ts) + 600000
      ORDER BY a.user_id, a_id, b_id NULLS FIRST"""))

  /** The streaming incremental curation composite (VERDICT r9 item 5):
    * the q154 web-curate chain run as a DAILY-DELTA STREAM — each
    * AvailableNow micro-batch applies URL gate → HTML→text → quality →
    * decontaminate row-locally, then canonical-URL dedup against a
    * PERSISTED url index (seeded from the already-curated base corpus,
    * grown by each epoch's accepted urls), exactly the operational shape
    * of a crawl pipeline ingesting a day at a time. First epoch carrying
    * a url wins it; within an epoch, keep-best (q DESC, doc_id ASC) —
    * both rules replay in SQL because the epoch schedule is fixed
    * (doc_id-ordered log, maxPerTrigger = max(1, n/7)).
    *
    * Decontamination is applied BEFORE the url claim (a contaminated doc
    * never blocks a clean recrawl of the same page) — stated because the
    * arrow order in prose ("dedup → decontaminate") leaves it ambiguous.
    *
    * Bounded state: the streaming query itself is STATELESS (foreachBatch;
    * no watermark state, no mapGroupsWithState) — the only growing
    * artifact is the persisted url index, which is disk-resident,
    * grows only with ACCEPTED canonical urls, and at 100 TB would be the
    * same bucketed table the minhash index uses. Nothing scales with
    * stream length in executor or driver memory except the gate's own
    * result accumulator (the drained FINAL table, as in every gate). */
  /** The q156 row-local curation chain (url gate → synthetic HTML → text
    * extraction → quality floor → decontaminate) — shared verbatim by the
    * base-corpus seed, every streaming epoch, and the epoch-robustness
    * property spec's driver-side replay (StreamingSpec). */
  private[graft] def curateChain(s: SparkSession, dir: String)(in: DataFrame): DataFrame = {
    import graft.functions.{html_to_text, url_parts, url_valid}
    val blocked = Seq("github.io", "src0.com")
    val docs = t(s, dir, "documents")
    val html = concat(
      lit("<html><head><style>p{}</style><script>var x;</script></head><body><h1>T "),
      col("doc_id").cast("string"), lit("</h1><p>"), substring(col("text"), 1, 120),
      lit(" &amp; more</p><!-- nav --></body></html>"))
    val evalHashes = docs.filter(pmod(col("doc_id"), lit(11)) === 7)
      .select(md5(col("text")).as("__h")).distinct()
    val p = url_parts(col("url"))
    in.withColumn("url", Catalog.urlCol)
      .filter(url_valid(col("url")))
      .withColumn("html", html)
      .select(col("doc_id"),
        p.getField("host").as("host"),
        p.getField("registrable_domain").as("domain"),
        p.getField("canonical_url").as("canonical_url"),
        html_to_text(col("html")).as("tc"), col("text"))
      .filter(!blocked.map(b =>
        col("host") === b || col("host").endsWith("." + b)).reduce(_ || _))
      .select(col("domain"), col("canonical_url"), col("doc_id"),
        length(col("tc")).cast("long").as("q"), md5(col("text")).as("__h"))
      .filter(col("q") >= 60)
      .join(broadcast(evalHashes), Seq("__h"), "left_anti")
      .drop("__h")
  }

  /** One full q156 run at a caller-chosen epoch schedule: `perOf` maps
    * the delta's published row count to `maxPerTrigger` (the QueryDef
    * uses n/7; the epoch-robustness property spec re-runs other
    * schedules and replays each one's first-epoch-wins outcome
    * driver-side). `tag` isolates the topic / index / checkpoint
    * namespaces per run. */
  private[graft] def streamCurate(s: SparkSession, dir: String,
      perOf: Long => Long, tag: String): DataFrame = {
      import s.implicits._
      val uri = s"hub:$dir/sgate_$tag"
      val docs = t(s, dir, "documents")
      def chain(in: DataFrame): DataFrame = curateChain(s, dir)(in)

      // persisted url index, seeded with the curated BASE corpus's urls —
      // UrlIndex gives it the lifecycle the other persisted indexes have:
      // exactly-once per-epoch claim dirs, a fragmentation counter, and
      // compaction (UrlIndexSpec pins bounded file count over many epochs)
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft-sgate-urlidx-" +
        s"${java.lang.ProcessHandle.current().pid()}-" +
        java.lang.Integer.toHexString(s"$dir/$tag".hashCode)
      graft.operators.UrlIndex.seed(
        chain(docs.filter(pmod(col("doc_id"), lit(3)) === 0))
          .select(col("canonical_url")), idxDir)

      // the delta arrives as a stream: doc_id-ordered log, JSON payload
      val delta = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val rows = delta.select(col("doc_id"), col("source"), col("text"))
        .orderBy(col("doc_id")).collect()
      MemHub.publish(uri, "docs", rows.iterator.map { r =>
        val payload = s"""{"source":${jsonStr(r.getString(1))},"text":${jsonStr(r.getString(2))}}"""
        (r.getLong(0).toString, Map.empty[String, String], r.getLong(0),
          payload.getBytes("UTF-8"))
      })
      val per = perOf(rows.length.toLong)
      val stream = s.readStream.format("graft-topic")
        .option("profile", "pulsar").option("uri", uri).option("topics", "docs")
        .option("maxPerTrigger", per.toString)
        .load()
        .select(col("key").cast("long").as("doc_id"),
          from_json(col("value").cast("string"),
            org.apache.spark.sql.types.StructType.fromDDL(
              "source STRING, text STRING")).as("j"))
        .select(col("doc_id"), col("j.source").as("source"), col("j.text").as("text"))

      val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long)]
      var epochs = 0L
      val cp = s"${System.getProperty("java.io.tmpdir")}/graft-sgate-cp-" +
        s"${java.lang.ProcessHandle.current().pid()}-" +
        java.lang.Integer.toHexString(s"$dir/$tag".hashCode)
      awaitIntake(s"q156:$tag", cpv => stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", cpv)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          // per-epoch: row-local chain, anti-join the PERSISTED index,
          // keep-best within the epoch, append the epoch's claims
          val gated = chain(batch)
          val fresh = gated.join(
            graft.operators.UrlIndex.members(s, idxDir),
            Seq("canonical_url"), "left_anti")
          val best = fresh
            .groupBy(col("canonical_url"))
            .agg(max(struct(col("q"), (-col("doc_id")).as("nid"),
              col("domain").as("d"))).as("__w"))
            .select(col("canonical_url"), col("__w.d").as("domain"),
              (-col("__w.nid")).as("doc_id"), col("__w.q").as("q"))
          val got = best.collect()
          synchronized {
            epochs = math.max(epochs, id + 1)
            accepted ++= got.map(r =>
              (r.getString(1), r.getString(0), r.getLong(2), r.getLong(3)))
          }
          graft.operators.UrlIndex.claim(
            s.createDataset(got.map(_.getString(0)).toSeq).toDF("canonical_url"),
            idxDir, id.toString)
          // table maintenance rides the stream: a no-op until the claim
          // dirs fragment past the threshold, then one fold — the gate's
          // few epochs never trip it (values are compaction-invariant
          // anyway, UrlIndexSpec proves membership identity)
          graft.operators.UrlIndex.compactIfFragmented(s, idxDir): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start(), cp, () => synchronized { epochs })
      accepted.toSeq.toDF("domain", "canonical_url", "doc_id", "q")
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"), sum(col("q")).as("n_chars_clean"))
        .withColumn("multi_epoch", lit(epochs > 1))
        .orderBy(col("domain"))
  }

  val qStreamCurate = QueryDef(
    "q156_stream_curate",
    (s, dir) => ran.getOrElseUpdate(s"$dir/scurate",
      streamCurate(s, dir, n => math.max(1L, n / 7L), "scurate")),
    Some {
      val blockedSql = Seq("github.io", "src0.com")
        .map(b => s"host = '$b' OR host LIKE '%.$b'").mkString(" OR ")
      val html = "'<html><head><style>p{}</style><script>var x;</script>" +
        "</head><body><h1>T ' || doc_id || '</h1><p>' || substr(text, 1, 120)" +
        " || ' &amp; more</p><!-- nav --></body></html>'"
      s"""WITH ${Catalog.urlParseCtes},
        h AS (SELECT doc_id, registrable_domain AS domain, canonical_url, text,
            $html AS html
          FROM parsed WHERE NOT ($blockedSql)),
        e AS (SELECT doc_id, domain, canonical_url, text,
            CAST(length(${graft.functions.HtmlKit.duckDbSql("html")}) AS BIGINT) AS q
          FROM h),
        cl AS (SELECT * FROM e WHERE q >= 60
          AND md5(text) NOT IN
            (SELECT md5(text) FROM documents WHERE doc_id % 11 = 7)),
        base AS (SELECT DISTINCT canonical_url FROM cl WHERE doc_id % 3 = 0),
        np AS (SELECT GREATEST(1, CAST(COUNT(*) // 7 AS BIGINT)) AS per
          FROM documents WHERE doc_id % 3 <> 0),
        ep AS (SELECT doc_id,
            CAST((row_number() OVER (ORDER BY doc_id) - 1) // (SELECT per FROM np) AS BIGINT) AS epoch
          FROM documents WHERE doc_id % 3 <> 0),
        d2 AS (SELECT cl.*, ep.epoch FROM cl JOIN ep USING (doc_id)
          WHERE cl.doc_id % 3 <> 0
            AND cl.canonical_url NOT IN (SELECT canonical_url FROM base)),
        f AS (SELECT *, MIN(epoch) OVER (PARTITION BY canonical_url) AS fe FROM d2),
        k AS (SELECT * FROM f WHERE epoch = fe),
        r AS (SELECT *, row_number() OVER (PARTITION BY canonical_url
            ORDER BY q DESC, doc_id ASC) AS rnk FROM k),
        acc AS (SELECT * FROM r WHERE rnk = 1)
      SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(q) AS BIGINT) AS n_chars_clean, TRUE AS multi_epoch
      FROM acc GROUP BY domain ORDER BY domain"""
    })

  /** Streaming near-dup ingest against the persisted minhash index — the
    * continuous-crawl counterpart of q156's exact-URL gate, and the
    * production shape for dedup at ingest time: the corpus index is built
    * ONCE ([[graft.operators.Dedup.minhashIndexWrite]]); every arriving
    * micro-batch is (a) served against the index
    * ([[graft.operators.Dedup.minhashLshAgainstIndex]] — only the batch
    * shuffles), (b) self-deduped within the batch (inline
    * [[graft.operators.Dedup.minhashLsh]] on the batch alone), and then
    * (c) the WHOLE batch — accepted and rejected alike — is merged into
    * the index ([[graft.operators.Dedup.minhashIndexAppend]],
    * batchId-idempotent), and (d) when
    * [[graft.operators.Dedup.minhashIndexStaleness]] reports the appended
    * mass past the fragmentation threshold, the index is defragmented in
    * place ([[graft.operators.Dedup.minhashIndexRebuild]]) — maintenance
    * rides the stream, with the counter reset as hysteresis.
    *
    * Indexing rejected docs too is deliberate: the index is a SEEN-
    * SIGNATURES set, not the accepted corpus. A later doc that near-dups
    * a rejected doc belongs to a dup cluster that already has a kept
    * representative (via the chain), so it is suppressed as well — the
    * conservative transitive choice for training data. It also makes the
    * accepted set EPOCH-SCHEDULE-INVARIANT: a doc is accepted iff it has
    * no near-dup (exact Jaccard >= 0.8) among base docs or smaller-id
    * delta docs, regardless of how the stream was chunked — docs arrive
    * in doc_id order, so earlier epochs are exactly the smaller ids, and
    * same-epoch smaller ids are caught by the inline batch pass.
    * StreamingSpec pins the invariance property (several maxPerTrigger
    * schedules, identical accepted set) and the chain semantics (A~B~C
    * with A!~C: C stays suppressed although B was).
    *
    * Bounded state: the streaming query is STATELESS (foreachBatch, no
    * watermark/mapGroupsWithState state); the growing artifact is the
    * bucketed index on disk. The per-epoch collects are the gate's
    * documented test accumulators, not the production shape. */
  /** In-stream rebuild count per streamDedupIngest tag — observability
    * for the spec (the gate's result schema is pinned by the oracle). */
  private[graft] val sdiRebuilds =
    new scala.collection.concurrent.TrieMap[String, Long]()

  /** One q159 epoch against the persisted index `tbl`: serve → within-
    * batch dedup → seen-signature merge → in-stream maintenance. Returns
    * (accepted (doc_id, chars), seen (doc_id, source)) rows. Extracted so
    * the resume/replay specs drive the SHIPPED epoch logic through their
    * own checkpoints.
    *
    * Replay boundary (pinned by StreamingSpec): the index merge is
    * exactly-once per batchId, so a replayed epoch (checkpoint lost
    * after the append committed) never duplicates index rows — and the
    * replayed epoch's ACCEPTED SET equals the original run's, i.e. the
    * epoch is a deterministic function of its batch and the PRIOR index
    * state. The index rows carry doc_id, so the two contaminating pair
    * classes a replay introduces are both identifiable and excluded:
    * same-id pairs (a doc vs its own committed signature) are dropped
    * inside [[graft.operators.Dedup.minhashLshAgainstIndex]], and pairs
    * whose index doc is itself a member of the current batch are exactly
    * the within-batch pairs — owned by the smaller-id-wins pass below on
    * the fresh run and on the replay alike — so the serve leg anti-joins
    * them out. On a fresh epoch neither class exists (ids are disjoint
    * from the index), so the non-replay semantics are unchanged
    * (StreamingSpec asserts both). A downstream sink that lost its
    * commit still under-emits until the replay re-emits — the standard
    * at-least-once boundary of a side-effecting foreachBatch — but what
    * it re-emits is now byte-identical. */
  private[graft] def sdiEpoch(tbl: String, tag: String)(
      batch: DataFrame, id: Long): (Array[Row], Array[Row]) = {
    import graft.operators.Dedup
    val rejIdx = Dedup.minhashLshAgainstIndex(batch, "doc_id", "text", tbl)
      // replay: index docs that are members of THIS batch pair with
      // their batch-mates; those pairs belong to the within-batch pass
      // (which sees them under the same smaller-id-wins rule in both
      // runs) — a fresh epoch has no such pairs, so this is a no-op there
      .join(batch.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")
      .select(col("doc_b").as("doc_id"))
    // within-batch pass: doc_a < doc_b by construction, so dropping
    // every doc_b is exactly "smaller id wins" inside the epoch
    val rejSelf = Dedup.minhashLsh(batch, "doc_id", "text")
      .select(col("doc_b").as("doc_id"))
    val acc = batch
      .join(rejIdx.unionByName(rejSelf).distinct(), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), length(col("text")).cast("long")).collect()
    val sn = batch.select(col("doc_id"), col("source")).collect()
    // seen-signature merge: the FULL batch, exactly-once per epoch
    Dedup.minhashIndexAppend(batch, "doc_id", "text", tbl, id.toString)
    // table maintenance rides the stream (the q156 compaction pattern):
    // when the appended mass crosses the fragmentation threshold,
    // defragment in place. Banding is untrained, so the rebuild changes
    // NO pair semantics — the schedule-invariance property doubles as a
    // rebuild-point-invariance proof, since different epoch slicings
    // cross the threshold at different moments (and the counter reset
    // gives natural hysteresis). The rebuild must run on the MICRO-
    // BATCH's session: streaming clones the session per query, and each
    // clone has its own relation cache — a rebuild (and its post-swap
    // refresh) through the outer session would leave the clone's cache
    // pointing at the pre-swap file listing (FILE_NOT_EXIST next epoch)
    val bs = batch.sparkSession
    if (Dedup.minhashIndexStaleness(bs, tbl).head().getBoolean(3)) {
      Dedup.minhashIndexRebuild(bs, tbl)
      sdiRebuilds.updateWith(tag)(c => Some(c.getOrElse(0L) + 1L)): Unit
    }
    (acc, sn)
  }

  private[graft] def streamDedupIngest(s: SparkSession, docs: DataFrame,
      perOf: Long => Long, tag: String): DataFrame = {
    import s.implicits._
    import graft.operators.Dedup
    val uri = s"hub:sdi_$tag"
    val tbl = "sdi_" +
      java.lang.Long.toHexString(java.lang.ProcessHandle.current().pid()) +
      "_" + java.lang.Integer.toHexString(tag.hashCode).replace('-', 'm')
    Dedup.minhashIndexWrite(
      docs.filter(pmod(col("doc_id"), lit(3)) === 0), "doc_id", "text", tbl)
    val delta = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val rows = delta.select(col("doc_id"), col("source"), col("text"))
      .orderBy(col("doc_id")).collect()
    MemHub.publish(uri, "docs", rows.iterator.map { r =>
      val payload =
        s"""{"source":${jsonStr(r.getString(1))},"text":${jsonStr(r.getString(2))}}"""
      (r.getLong(0).toString, Map.empty[String, String], r.getLong(0),
        payload.getBytes("UTF-8"))
    })
    val per = perOf(rows.length.toLong)
    val stream = s.readStream.format("graft-topic")
      .option("profile", "pulsar").option("uri", uri).option("topics", "docs")
      .option("maxPerTrigger", per.toString)
      .load()
      .select(col("key").cast("long").as("doc_id"),
        from_json(col("value").cast("string"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "source STRING, text STRING")).as("j"))
      .select(col("doc_id"), col("j.source").as("source"), col("j.text").as("text"))
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var epochs = 0L
    val cp = s"${System.getProperty("java.io.tmpdir")}/graft-sdi-cp-" +
      s"${java.lang.ProcessHandle.current().pid()}-" +
      java.lang.Integer.toHexString(tag.hashCode)
    awaitIntake(s"q159:$tag", cpv => stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", cpv)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val (acc, sn) = sdiEpoch(tbl, tag)(batch, id)
        synchronized {
          epochs = math.max(epochs, id + 1)
          accepted ++= acc.map(r => (r.getLong(0), r.getLong(1)))
          seen ++= sn.map(r => (r.getLong(0), r.getString(1)))
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start(), cp, () => synchronized { epochs })
    graft.operators.Dedup.dropMinhashIndex(s, tbl)
    seen.toSeq.toDF("doc_id", "source")
      .join(accepted.toSeq.toDF("doc_id", "chars"), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_in"),
        count(col("chars")).as("n_accepted"),
        (count(lit(1)) - count(col("chars"))).as("n_rejected"),
        coalesce(sum(col("chars")), lit(0L)).as("n_chars_accepted"))
      .withColumn("multi_epoch", lit(epochs > 1))
      .orderBy(col("source"))
  }

  val qStreamDedupIngest = QueryDef(
    "q159_stream_dedup_ingest",
    (s, dir) => ran.getOrElseUpdate(s"$dir/sdi",
      streamDedupIngest(s, t(s, dir, "documents"),
        n => math.max(1L, n / 7L), s"q159_$dir")),
    // the accepted set is schedule-invariant (see streamDedupIngest), so
    // the replay needs no epoch simulation: a delta doc is rejected iff
    // it has an exact-Jaccard>=0.8 partner that is a base doc (always
    // indexed first) or a smaller-id delta doc (earlier epoch via the
    // index, or same epoch via the within-batch pass)
    Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
          THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])
          ELSE [array_to_string(t, ' ')] END AS g FROM toks),
      sg AS (SELECT doc_id, unnest(g) AS g FROM sh),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sg GROUP BY doc_id),
      i AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
            FROM sg a JOIN sg b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
      p AS (SELECT da, db
            FROM i JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
            WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.8),
      rej AS (SELECT db AS doc_id FROM p WHERE db % 3 <> 0
              UNION
              SELECT da FROM p WHERE da % 3 <> 0 AND db % 3 = 0),
      delta AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
      acc AS (SELECT * FROM delta WHERE doc_id NOT IN (SELECT doc_id FROM rej))
      SELECT d.source,
        CAST(COUNT(*) AS BIGINT) AS n_in,
        CAST(COUNT(a.doc_id) AS BIGINT) AS n_accepted,
        CAST(COUNT(*) - COUNT(a.doc_id) AS BIGINT) AS n_rejected,
        CAST(SUM(CASE WHEN a.doc_id IS NOT NULL THEN length(d.text) ELSE 0 END) AS BIGINT) AS n_chars_accepted,
        TRUE AS multi_epoch
      FROM delta d LEFT JOIN acc a USING (doc_id)
      GROUP BY d.source ORDER BY d.source"""))

  /** In-stream IVF maintenance counter per [[streamSemanticIngest]] tag —
    * observability for the spec (the gate's result schema is pinned by
    * the oracle, which asserts `rebuilt` TRUE). */
  private[graft] val ssiRebuilds =
    new scala.collection.concurrent.TrieMap[String, Long]()

  /** One q162 epoch against the persisted IVF index at `path`: serve →
    * within-batch pass → exactly-once append of the WHOLE batch
    * (seen-signature semantics, as in q159) → staleness check →
    * in-stream [[graft.operators.Similarity.rebuildIvfIndex]] on the
    * micro-batch's session. Replay discipline mirrors [[sdiEpoch]]: the
    * append's `_DONE` sentinel makes the merge exactly-once, and pairs
    * whose index member is in THIS batch (same-id self-pairs and
    * within-batch partners, both present only on a replay) are
    * anti-joined out so a replayed epoch returns the original accepted
    * set. The index is generation-published (GenDir), so the in-stream
    * rebuild needs NO cache invalidation: the cloned session's next
    * serve resolves the new generation path fresh — the gate running
    * epochs AFTER the rebuild (and staying oracle-exact) is the proof. */
  private[graft] def ssiEpoch(path: String, tag: String,
      deltaOf: SparkSession => DataFrame, threshold: Double)(
      batch: DataFrame, id: Long): (Array[Row], Array[Row]) = {
    import graft.operators.Similarity
    val bs = batch.sparkSession
    // enrich the admitted ids from the deterministic delta source ON THE
    // MICRO-BATCH's session (frames cannot cross sessions)
    val b = batch.join(deltaOf(bs), Seq("vec_id"))
      .select(col("vec_id"), col("grp"), col("embedding"))
    val rejIdx = Similarity.semanticDedupAgainstIndex(
        b, path, "vec_id", "embedding", threshold)
      .join(b.select(col("vec_id").as("id_a")), Seq("id_a"), "left_anti")
      .select(col("id_b").as("vec_id"))
    // within-batch pass: id_a < id_b drops the larger id — smaller id wins
    val rejSelf = Similarity.semanticDedupPairsWithCodebook(
        b, b, path, "vec_id", "embedding", threshold)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_b").as("vec_id"))
    val acc = b.join(rejIdx.unionByName(rejSelf).distinct(),
        Seq("vec_id"), "left_anti")
      .select(col("vec_id")).collect()
    val sn = b.select(col("vec_id"), col("grp")).collect()
    Similarity.appendToIvfIndex(b.select(col("vec_id"), col("embedding")),
      path, "vec_id", "embedding", batchId = s"e$id")
    if (Similarity.ivfIndexStaleness(bs, path).head().getBoolean(3)) {
      Similarity.rebuildIvfIndex(bs, path)
      ssiRebuilds.updateWith(tag)(c => Some(c.getOrElse(0L) + 1L)): Unit
    }
    (acc, sn)
  }

  /** Streaming semantic (embedding) dedup ingest against the persisted
    * IVF index — q159's continuous-ingest shape for the ANN family, and
    * the round-12 in-stream IVF maintenance parity gate (VERDICT r11
    * item 5): the index is built ONCE on the base corpus; each arriving
    * micro-batch is served against it
    * ([[graft.operators.Similarity.semanticDedupAgainstIndex]] — only
    * the batch computes assignments; the lists scan is partition-pruned
    * to the batch's buckets), self-deduped within the batch, merged
    * whole (seen-signature semantics), and when
    * [[graft.operators.Similarity.ivfIndexStaleness]] trips, RETRAINED
    * in-stream ([[graft.operators.Similarity.rebuildIvfIndex]] on the
    * micro-batch's session — maintenance rides the stream, serving
    * continues across the generation publish).
    *
    * The accepted set is epoch-schedule-invariant by the q159 argument:
    * vectors arrive in id order, so a vector is rejected iff it has a
    * cos≥threshold partner among base vectors or smaller-id delta
    * vectors — earlier epochs via the index, same epoch via the
    * within-batch pass. Rebuilds change detection only through codebook
    * assignment; at the gate's threshold the only qualifying pairs are
    * exact-duplicate vectors, which share their nearest list under ANY
    * codebook — so the gate is oracle-exact across every schedule and
    * every rebuild point, and the drifted-recall property (retraining
    * restores near-dup recall to fresh-build level) is measured
    * separately in StreamingSpec with a synthetic drifted stream.
    *
    * `deltaOf` rebuilds the (vec_id, grp, embedding) delta frame on a
    * GIVEN session — foreachBatch runs on a clone, and frames cannot
    * cross sessions. */
  private[graft] def streamSemanticIngest(
      s: SparkSession,
      base: DataFrame,
      deltaOf: SparkSession => DataFrame,
      perOf: Long => Long,
      tag: String,
      threshold: Double,
      onEpoch: (Long, Array[Row], Array[Row]) => Unit = (_, _, _) => ()): DataFrame = {
    import s.implicits._
    import graft.operators.Similarity
    val uri = s"hub:ssi_$tag"
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-ssi-" +
      s"${java.lang.ProcessHandle.current().pid()}-" +
      java.lang.Integer.toHexString(tag.hashCode).replace('-', 'm')
    val fsP = new org.apache.hadoop.fs.Path(path)
    val fs = fsP.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(fsP)) fs.delete(fsP, true)
    Similarity.buildIvfIndex(base, path, "vec_id", "embedding")
    val ids = deltaOf(s).select(col("vec_id")).orderBy(col("vec_id"))
      .collect().map(_.getLong(0))
    MemHub.publish(uri, "vecs", ids.iterator.map { v =>
      (v.toString, Map.empty[String, String], v, Array[Byte](1))
    })
    val per = perOf(ids.length.toLong)
    val stream = s.readStream.format("graft-topic")
      .option("profile", "pulsar").option("uri", uri).option("topics", "vecs")
      .option("maxPerTrigger", per.toString)
      .load()
      .select(col("key").cast("long").as("vec_id"))
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var epochs = 0L
    val cp = s"${System.getProperty("java.io.tmpdir")}/graft-ssi-cp-" +
      s"${java.lang.ProcessHandle.current().pid()}-" +
      java.lang.Integer.toHexString(tag.hashCode)
    awaitIntake(s"q162:$tag", cpv => stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", cpv)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val (acc, sn) = ssiEpoch(path, tag, deltaOf, threshold)(batch, id)
        synchronized {
          epochs = math.max(epochs, id + 1)
          accepted ++= acc.map(_.getLong(0))
          seen ++= sn.map(r => (r.getLong(0), r.getInt(1)))
        }
        onEpoch(id, acc, sn)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start(), cp, () => synchronized { epochs })
    seen.toSeq.toDF("vec_id", "label")
      .join(accepted.toSeq.toDF("vec_id").withColumn("__a", lit(1)),
        Seq("vec_id"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_in"),
        count(col("__a")).as("n_accepted"),
        (count(lit(1)) - count(col("__a"))).as("n_rejected"))
      .withColumn("multi_epoch", lit(epochs > 1))
      .withColumn("rebuilt", lit(ssiRebuilds.getOrElse(tag, 0L) > 0L))
      .orderBy(col("label"))
  }

  /** The q162 delta: embeddings with vec_id % 3 != 0, where two id
    * classes are EXACT twins (the oracle-safe dedup signal — distinct
    * fixture vectors top out at cos ~0.6, far under the threshold):
    * v % 7 == 1 streams the embedding of base vector 3·⌊(v−1)/3⌋ (an
    * index member from epoch 0), and v % 7 == 2 (v ≥ 3) streams the
    * embedding of delta vector v−3 (same residue class, smaller id,
    * itself raw since (v−3) % 7 == 6 — no twin chains). Everything else
    * streams its own (unique) embedding. */
  private[graft] def ssiDelta(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label").as("grp"), col("embedding"))
    val d0 = raw.filter(col("vec_id") % 3 =!= 0)
    val cls1 = d0.filter(col("vec_id") % 7 === 1)
      .select(col("vec_id"), col("grp"),
        (col("vec_id") - lit(1) - pmod(col("vec_id") - 1, lit(3))).as("src"))
    val cls2 = d0.filter(col("vec_id") % 7 === 2 && col("vec_id") >= 3)
      .select(col("vec_id"), col("grp"), (col("vec_id") - 3).as("src"))
    val twins = cls1.unionByName(cls2)
      .join(raw.select(col("vec_id").as("src"), col("embedding")), Seq("src"))
      .select(col("vec_id"), col("grp"), col("embedding"))
    d0.join(twins.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .unionByName(twins)
  }

  val qStreamSemanticIngest = QueryDef(
    "q162_stream_semantic_ingest",
    (s, dir) => ran.getOrElseUpdate(s"$dir/ssi",
      streamSemanticIngest(s,
        t(s, dir, "embeddings").filter(col("vec_id") % 3 === 0)
          .select(col("vec_id"), col("embedding")),
        bs => ssiDelta(bs, dir),
        n => math.max(1L, n / 7L), s"q162_$dir", threshold = 0.99)),
    // schedule-invariant replay (see streamSemanticIngest): a delta
    // vector is rejected iff its STREAMED embedding equals (list
    // equality — the only pairs over the 0.99 threshold are exact
    // twins) a base embedding or a smaller-id delta's streamed
    // embedding. `rebuilt` is TRUE deterministically: at per = n/7 the
    // appended fraction crosses 0.5 mid-stream at every sf
    Some("""WITH e AS (SELECT vec_id AS v, label, embedding AS emb FROM embeddings),
      d AS (SELECT v, label,
          CASE WHEN v % 7 = 1 THEN (SELECT b.emb FROM e b WHERE b.v = d0.v - 1 - ((d0.v - 1) % 3))
               WHEN v % 7 = 2 AND v >= 3 THEN (SELECT b.emb FROM e b WHERE b.v = d0.v - 3)
               ELSE emb END AS se
        FROM e d0 WHERE v % 3 <> 0),
      r AS (SELECT d.v, d.label,
          (EXISTS (SELECT 1 FROM e b WHERE b.v % 3 = 0 AND b.emb = d.se)
           OR EXISTS (SELECT 1 FROM d d2 WHERE d2.v < d.v AND d2.se = d.se)) AS rej
        FROM d)
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_in,
        CAST(SUM(CASE WHEN rej THEN 0 ELSE 1 END) AS BIGINT) AS n_accepted,
        CAST(SUM(CASE WHEN rej THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected,
        TRUE AS multi_epoch, TRUE AS rebuilt
      FROM r GROUP BY label ORDER BY label"""))

  /** In-stream phash-index rebuilds per [[streamPhashIngest]] tag. */
  private[graft] val spiRebuilds =
    new scala.collection.concurrent.TrieMap[String, Long]()

  /** The q167 delta: documents with doc_id % 3 != 0 wrapped as binary
    * media, where two id classes stream exact PAYLOAD twins (the q162
    * device, text-byte modality — the [[spiDelta]] probe found zero
    * non-identical payload pairs within Hamming ≤ 3 at any SF, so a
    * perceptual-hash reject is exactly a payload-equality reject and the
    * oracle replays plain text equality): v % 7 == 1 streams the payload
    * of base doc 3·⌊(v−1)/3⌋ (an index member from epoch 0), v % 7 == 2
    * (v ≥ 3) streams delta doc v−3's payload (same residue class,
    * smaller id, itself raw since (v−3) % 7 == 6 — no twin chains);
    * everything else streams its own text bytes. */
  private[graft] def spiDelta(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val d0 = raw.filter(col("doc_id") % 3 =!= 0)
    val cls1 = d0.filter(col("doc_id") % 7 === 1)
      .select(col("doc_id"), col("source"),
        (col("doc_id") - lit(1) - pmod(col("doc_id") - 1, lit(3))).as("src"))
    val cls2 = d0.filter(col("doc_id") % 7 === 2 && col("doc_id") >= 3)
      .select(col("doc_id"), col("source"), (col("doc_id") - 3).as("src"))
    val twins = cls1.unionByName(cls2)
      .join(raw.select(col("doc_id").as("src"), col("text").as("stext")),
        Seq("src"))
      .select(col("doc_id"), col("source"), col("stext").as("text"))
    d0.join(twins.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(twins)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media", graft.operators.Media.asMedia("payload", "image/stub"))
      .select(col("doc_id"), col("source"), col("media"))
  }

  /** One q167 epoch against the persisted phash index at `path` — the
    * sdiEpoch discipline, hamming-banded: serve (same-id pairs dropped
    * in [[graft.operators.PhashIndex.pairsAgainstIndex]]; pairs whose
    * index doc is in THIS batch anti-joined to the within-batch pass —
    * the replay guard) → smaller-id-wins within the batch →
    * seen-signature merge (exactly-once per batchId, `_DONE`-gated) →
    * staleness-triggered in-stream REBUILD (generation publish; banding
    * is untrained so the fold changes no pair — rebuild-point
    * invariance is the same property as schedule invariance). */
  private[graft] def spiEpoch(path: String, tag: String)(
      batch: DataFrame, id: Long): (Array[Row], Array[Row]) = {
    import graft.operators.{Media, PhashIndex}
    val bs = batch.sparkSession
    val rejIdx = PhashIndex.pairsAgainstIndex(batch, "doc_id", "media", path)
      .join(batch.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")
      .select(col("doc_b").as("doc_id"))
    val rejSelf = Media.perceptualDupPairs(batch, "doc_id", "media")
      .select(col("doc_b").as("doc_id"))
    val acc = batch
      .join(rejIdx.unionByName(rejSelf).distinct(), Seq("doc_id"), "left_anti")
      .select(col("doc_id")).collect()
    val sn = batch.select(col("doc_id"), col("source")).collect()
    PhashIndex.append(batch, "doc_id", "media", path, id.toString)
    if (PhashIndex.staleness(bs, path).head().getBoolean(3)) {
      PhashIndex.rebuild(bs, path)
      spiRebuilds.updateWith(tag)(c => Some(c.getOrElse(0L) + 1L)): Unit
    }
    (acc, sn)
  }

  /** Streaming perceptual-hash dedup ingest — q159's continuous-ingest
    * shape for the MULTIMODAL family, closing its lifecycle gap: the
    * phash index is built once on the base corpus's media, every
    * arriving micro-batch is served/self-deduped/merged, and the index
    * is defragmented in-stream when the appended fraction trips. The
    * accepted set is schedule-invariant by the q159 argument (docs
    * arrive in id order; reject ⟺ a Hamming≤3 partner among base or
    * smaller-id delta payloads ⟺ payload equality on these fixtures),
    * so the oracle replays plain text equality over the twin CASE. */
  private[graft] def streamPhashIngest(s: SparkSession, dir: String,
      perOf: Long => Long, tag: String): DataFrame = {
    import s.implicits._
    import graft.operators.{Media, PhashIndex}
    val uri = s"hub:spi_$tag"
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-spi-" +
      s"${java.lang.ProcessHandle.current().pid()}-" +
      java.lang.Integer.toHexString(tag.hashCode).replace('-', 'm')
    val fsP = new org.apache.hadoop.fs.Path(path)
    val fs = fsP.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(fsP)) fs.delete(fsP, true)
    val base = t(s, dir, "documents")
      .filter(col("doc_id") % 3 === 0)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media", Media.asMedia("payload", "image/stub"))
      .select(col("doc_id"), col("media"))
    PhashIndex.build(base, "doc_id", "media", path)
    val ids = spiDelta(s, dir).select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0))
    MemHub.publish(uri, "docs", ids.iterator.map { v =>
      (v.toString, Map.empty[String, String], v, Array[Byte](1))
    })
    val per = perOf(ids.length.toLong)
    val stream = s.readStream.format("graft-topic")
      .option("profile", "pulsar").option("uri", uri).option("topics", "docs")
      .option("maxPerTrigger", per.toString)
      .load()
      .select(col("key").cast("long").as("doc_id"))
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var epochs = 0L
    val cp = s"${System.getProperty("java.io.tmpdir")}/graft-spi-cp-" +
      s"${java.lang.ProcessHandle.current().pid()}-" +
      java.lang.Integer.toHexString(tag.hashCode)
    awaitIntake(s"q167:$tag", cpv => stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", cpv)
      .foreachBatch { (idBatch: DataFrame, id: Long) =>
        val bs = idBatch.sparkSession
        val batch = idBatch.join(spiDelta(bs, dir), Seq("doc_id"))
        val (acc, sn) = spiEpoch(path, tag)(batch, id)
        synchronized {
          epochs = math.max(epochs, id + 1)
          accepted ++= acc.map(_.getLong(0))
          seen ++= sn.map(r => (r.getLong(0), r.getString(1)))
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start(), cp, () => synchronized { epochs })
    seen.toSeq.toDF("doc_id", "source")
      .join(accepted.toSeq.toDF("doc_id").withColumn("__a", lit(1)),
        Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_in"),
        count(col("__a")).as("n_accepted"),
        (count(lit(1)) - count(col("__a"))).as("n_rejected"))
      .withColumn("multi_epoch", lit(epochs > 1))
      .withColumn("rebuilt", lit(spiRebuilds.getOrElse(tag, 0L) > 0L))
      .orderBy(col("source"))
  }

  val qStreamPhashIngest = QueryDef(
    "q167_stream_phash_ingest",
    (s, dir) => ran.getOrElseUpdate(s"$dir/spi",
      streamPhashIngest(s, dir, n => math.max(1L, n / 7L), s"q167_$dir")),
    // reject ⟺ streamed payload equals a base doc's payload or a
    // smaller-id delta's streamed payload (see spiDelta: Hamming ≤ 3 ⟺
    // payload equality on these fixtures — probed at every SF).
    // `rebuilt` is deterministically TRUE: appended mass ends at 2× the
    // built mass, so the 0.5 fraction trips mid-stream at every sf
    Some("""WITH e AS (SELECT doc_id AS v, source, text FROM documents),
      d AS (SELECT v, source,
          CASE WHEN v % 7 = 1 THEN (SELECT b.text FROM e b WHERE b.v = d0.v - 1 - ((d0.v - 1) % 3))
               WHEN v % 7 = 2 AND v >= 3 THEN (SELECT b.text FROM e b WHERE b.v = d0.v - 3)
               ELSE text END AS st
        FROM e d0 WHERE v % 3 <> 0),
      r AS (SELECT d.v, d.source,
          (EXISTS (SELECT 1 FROM e b WHERE b.v % 3 = 0 AND b.text = d.st)
           OR EXISTS (SELECT 1 FROM d d2 WHERE d2.v < d.v AND d2.st = d.st)) AS rej
        FROM d)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_in,
        CAST(SUM(CASE WHEN rej THEN 0 ELSE 1 END) AS BIGINT) AS n_accepted,
        CAST(SUM(CASE WHEN rej THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected,
        TRUE AS multi_epoch, TRUE AS rebuilt
      FROM r GROUP BY source ORDER BY source"""))

  /** In-stream registry compactions per [[streamClusterIngest]] tag. */
  private[graft] val scrCompactions =
    new scala.collection.concurrent.TrieMap[String, Long]()

  /** One q163 epoch: near-dup edges for the batch (index serve with the
    * replay guard + within-batch pass) →
    * [[graft.operators.ClusterRegistry.registerEpoch]] (exactly-once per
    * batchId) → seen-signature index merge → registry maintenance (fold
    * the relabel log in-stream when its batch count trips — the
    * generation publish keeps concurrent reads safe). The edge frames
    * stay distributed end-to-end: `registerEpoch` collects them only
    * below its driver ceiling, and a hot-template epoch past
    * [[graft.operators.ClusterRegistry.MaxEpochEdges]] dispatches to the
    * connected-components pass instead. */
  private[graft] def scrEpoch(tbl: String, regPath: String, tag: String)(
      batch: DataFrame, id: Long): Array[Row] = {
    import graft.operators.{ClusterRegistry, Dedup}
    val bs = batch.sparkSession
    val idxEdges = Dedup.minhashLshAgainstIndex(batch, "doc_id", "text", tbl)
      // replay guard (the q159/q162 discipline): index pairs whose index
      // member is in THIS batch are the within-batch pass's property
      .join(batch.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")
      .select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"))
    val selfEdges = Dedup.minhashLsh(batch, "doc_id", "text")
      .select(col("doc_a"), col("doc_b"))
    ClusterRegistry.registerEpoch(bs, regPath, batch.select(col("doc_id")),
      idxEdges.unionByName(selfEdges), id.toString)
    Dedup.minhashIndexAppend(batch, "doc_id", "text", tbl, id.toString)
    if (ClusterRegistry.staleness(bs, regPath).head().getBoolean(3)) {
      ClusterRegistry.compact(bs, regPath)
      scrCompactions.updateWith(tag)(c => Some(c.getOrElse(0L) + 1L)): Unit
    }
    batch.select(col("doc_id")).collect()
  }

  /** Streaming dup-cluster registry ingest — the PROVENANCE leg of the
    * dedup lifecycle (q159 decides accept/reject; this assigns every
    * document its STABLE cluster id as it arrives): the minhash index is
    * built on the base corpus and its own near-dup structure seeds the
    * [[graft.operators.ClusterRegistry]] (CC over the base pairs); every
    * arriving micro-batch contributes its observed edges (vs the seen
    * index + within itself), and the registry's incremental union-find
    * folds them in — a document bridging two existing clusters appends
    * ONE relabel row instead of rewriting the losing cluster's members,
    * and the relabel log is folded in-stream when its batch count trips
    * (reader-atomic generation publish).
    *
    * The final assignment is provably schedule-invariant: docs arrive in
    * id order against a seen-signature index, so the union of observed
    * edges over any schedule is EVERY exact-Jaccard≥0.8 pair among the
    * corpus (base↔base via the seed, the rest via serve/within-batch),
    * and incremental union-find and batch connected components agree on
    * the final partition — the oracle replays plain transitive closure
    * over the exact pair set. */
  private[graft] def streamClusterIngest(s: SparkSession, docs: DataFrame,
      perOf: Long => Long, tag: String): DataFrame = {
    import s.implicits._
    import graft.operators.{ClusterRegistry, Dedup}
    val uri = s"hub:scr_$tag"
    val tbl = "scr_" +
      java.lang.Long.toHexString(java.lang.ProcessHandle.current().pid()) +
      "_" + java.lang.Integer.toHexString(tag.hashCode).replace('-', 'm')
    val regPath = s"${System.getProperty("java.io.tmpdir")}/graft-scr-" +
      s"${java.lang.ProcessHandle.current().pid()}-" +
      java.lang.Integer.toHexString(tag.hashCode).replace('-', 'm')
    val base = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    Dedup.minhashIndexWrite(base, "doc_id", "text", tbl)
    ClusterRegistry.seed(s, Dedup.minhashLsh(base, "doc_id", "text"), regPath)
    val delta = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val rows = delta.select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).collect()
    MemHub.publish(uri, "docs", rows.iterator.map { r =>
      val payload = s"""{"text":${jsonStr(r.getString(1))}}"""
      (r.getLong(0).toString, Map.empty[String, String], r.getLong(0),
        payload.getBytes("UTF-8"))
    })
    val per = perOf(rows.length.toLong)
    val stream = s.readStream.format("graft-topic")
      .option("profile", "pulsar").option("uri", uri).option("topics", "docs")
      .option("maxPerTrigger", per.toString)
      .load()
      .select(col("key").cast("long").as("doc_id"),
        from_json(col("value").cast("string"),
          org.apache.spark.sql.types.StructType.fromDDL("text STRING")).as("j"))
      .select(col("doc_id"), col("j.text").as("text"))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    var epochs = 0L
    val cp = s"${System.getProperty("java.io.tmpdir")}/graft-scr-cp-" +
      s"${java.lang.ProcessHandle.current().pid()}-" +
      java.lang.Integer.toHexString(tag.hashCode)
    awaitIntake(s"q163:$tag", cpv => stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", cpv)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val sn = scrEpoch(tbl, regPath, tag)(batch, id)
        synchronized {
          epochs = math.max(epochs, id + 1)
          seen ++= sn.map(_.getLong(0))
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start(), cp, () => synchronized { epochs })
    Dedup.dropMinhashIndex(s, tbl)
    ClusterRegistry.assignFor(seen.toSeq.toDF("doc_id"), regPath)
      .withColumn("multi_epoch", lit(epochs > 1))
      .withColumn("registry_compacted",
        lit(scrCompactions.getOrElse(tag, 0L) > 0L))
      .orderBy(col("doc_id"))
  }

  /** In-stream registry compactions per [[streamCrossmodalIngest]] tag. */
  private[graft] val sxmCompactions =
    new scala.collection.concurrent.TrieMap[String, Long]()

  /** The q171 corpus: the q170 cross-modal fixture (full copies at %7 —
    * text AND media dup — plus media-only copies at %5 whose filler tail
    * pushes text Jaccard under the 0.8 threshold), each doc's media
    * payload the 200-char text prefix (the re-hosted-image-same-article
    * shape). Clusters exist that NEITHER family finds alone, so the
    * per-epoch union of both pair streams is load-bearing. */
  private[graft] def sxmDocs(s: SparkSession, dir: String): DataFrame =
    Catalog.crossmodalDd(s, dir)
      .withColumn("payload", encode(substring(col("text"), 1, 200), "UTF-8"))
      .withColumn("media", graft.operators.Media.asMedia("payload", "image/stub"))
      .select(col("doc_id"), col("text"), col("media"))

  /** Per-copy quality signal (the q169/q170 election convention). */
  private def sxmQual(df: DataFrame): DataFrame = df.select(col("doc_id"),
    pmod(col("doc_id"), lit(97)).cast("double").as("quality"))

  /** One q171 epoch: BOTH families' near-dup edges for the batch — the
    * text minhash serve against the seen index (replay guard: index pairs
    * whose index member is in THIS batch are the within-batch pass's
    * property) plus the within-batch minhash pass, UNIONed with the media
    * phash serve plus the within-batch phash pass — feed ONE quality-aware
    * [[graft.operators.ClusterRegistry.registerEpoch]] (exactly-once per
    * batchId), then BOTH seen-indexes merge the batch and the registry
    * folds its relabel log in-stream when its batch count trips. The edge
    * frames stay distributed end-to-end (the q163 discipline): the
    * registry collects them only below its driver ceiling. */
  private[graft] def sxmEpoch(tbl: String, phPath: String, regPath: String,
      tag: String)(batch: DataFrame, id: Long): Array[Row] = {
    import graft.operators.{ClusterRegistry, Dedup, Media, PhashIndex}
    val bs = batch.sparkSession
    val textIdx = Dedup.minhashLshAgainstIndex(batch, "doc_id", "text", tbl)
      .join(batch.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")
      .select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"))
    val textSelf = Dedup.minhashLsh(batch, "doc_id", "text")
      .select(col("doc_a"), col("doc_b"))
    val mediaIdx = PhashIndex.pairsAgainstIndex(batch, "doc_id", "media", phPath)
      .join(batch.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")
      .select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"))
    val mediaSelf = Media.perceptualDupPairs(batch, "doc_id", "media")
      .select(col("doc_a"), col("doc_b"))
    ClusterRegistry.registerEpoch(bs, regPath, sxmQual(batch),
      textIdx.unionByName(textSelf).unionByName(mediaIdx).unionByName(mediaSelf),
      id.toString)
    Dedup.minhashIndexAppend(batch, "doc_id", "text", tbl, id.toString)
    PhashIndex.append(batch, "doc_id", "media", phPath, id.toString)
    if (ClusterRegistry.staleness(bs, regPath).head().getBoolean(3)) {
      ClusterRegistry.compact(bs, regPath)
      sxmCompactions.updateWith(tag)(c => Some(c.getOrElse(0L) + 1L)): Unit
    }
    batch.select(col("doc_id")).collect()
  }

  /** Streaming CROSS-MODAL dedup-map ingest — q170's union-of-families
    * composed in-stream (VERDICT r14 item 3): the minhash index, the phash
    * index and ONE [[graft.operators.ClusterRegistry]] are built on the
    * base corpus (the registry seeded with CC over the UNION of both
    * families' base pairs, quality-aware); every arriving micro-batch
    * contributes both families' observed edges into the same registry and
    * merges both seen-indexes; the registry's relabel log folds in-stream.
    * Publishes the per-doc dedup-map row ([[graft.operators
    * .ClusterRegistry.assignWithReps]]: stable cluster id + keep-best
    * elected representative) for every streamed doc.
    *
    * Schedule-invariant by the q163 argument, per family: docs arrive in
    * id order against seen-signature indexes, so the union of observed
    * edges over any schedule is every exact-Jaccard≥0.8 text pair PLUS
    * every payload-prefix-equal media pair among the corpus (base↔base via
    * the seed, the rest via serve/within-batch), and incremental
    * union-find equals batch CC over that union — the q170 oracle's
    * cluster structure, restricted to the streamed docs. */
  private[graft] def streamCrossmodalIngest(s: SparkSession, dir: String,
      perOf: Long => Long, tag: String): DataFrame = {
    import s.implicits._
    import graft.operators.{ClusterRegistry, Dedup, Media, PhashIndex}
    val uri = s"hub:sxm_$tag"
    val pid = java.lang.ProcessHandle.current().pid()
    val hx = java.lang.Integer.toHexString(tag.hashCode).replace('-', 'm')
    val tbl = s"sxm_${java.lang.Long.toHexString(pid)}_$hx"
    val phPath = s"${System.getProperty("java.io.tmpdir")}/graft-sxm-ph-$pid-$hx"
    val regPath = s"${System.getProperty("java.io.tmpdir")}/graft-sxm-reg-$pid-$hx"
    Seq(phPath, regPath).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.delete(hp, true)
    }
    val docs = sxmDocs(s, dir)
    val base = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    Dedup.minhashIndexWrite(base, "doc_id", "text", tbl)
    PhashIndex.build(base, "doc_id", "media", phPath)
    ClusterRegistry.seed(s,
      Dedup.minhashLsh(base, "doc_id", "text")
        .select(col("doc_a"), col("doc_b"))
        .unionByName(Media.perceptualDupPairs(base, "doc_id", "media")
          .select(col("doc_a"), col("doc_b"))),
      regPath, Some(sxmQual(base)))
    val ids = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      .select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0))
    MemHub.publish(uri, "docs", ids.iterator.map { v =>
      (v.toString, Map.empty[String, String], v, Array[Byte](1))
    })
    val per = perOf(ids.length.toLong)
    val stream = s.readStream.format("graft-topic")
      .option("profile", "pulsar").option("uri", uri).option("topics", "docs")
      .option("maxPerTrigger", per.toString)
      .load()
      .select(col("key").cast("long").as("doc_id"))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    var epochs = 0L
    val cp = s"${System.getProperty("java.io.tmpdir")}/graft-sxm-cp-$pid-" +
      java.lang.Integer.toHexString(tag.hashCode)
    awaitIntake(s"q171:$tag", cpv => stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", cpv)
      .foreachBatch { (idBatch: DataFrame, id: Long) =>
        val bs = idBatch.sparkSession
        // pin the epoch's payload-joined batch: sxmEpoch has ~8 consumers
        // (two serves, two self passes, the registry collect, both index
        // appends, the seen collect) and each would otherwise re-derive
        // the 3-leg expanded corpus from parquet — the pin makes every
        // consumer read micro-batch-sized in-memory rows instead
        val batch = graft.core.GraftSession.pin(
          idBatch.join(sxmDocs(bs, dir), Seq("doc_id")))
        val sn =
          try sxmEpoch(tbl, phPath, regPath, tag)(batch, id)
          finally graft.core.GraftSession.release(batch)
        synchronized {
          epochs = math.max(epochs, id + 1)
          seen ++= sn.map(_.getLong(0))
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start(), cp, () => synchronized { epochs })
    Dedup.dropMinhashIndex(s, tbl)
    ClusterRegistry.assignWithReps(seen.toSeq.toDF("doc_id"), regPath)
      .select(col("doc_id"), col("cluster_id"), col("rep_doc"),
        (col("doc_id") === col("rep_doc")).as("kept"),
        when(col("doc_id") === col("rep_doc"), lit(-1L))
          .otherwise(col("rep_doc")).as("suppressed_by_rep"))
      .withColumn("multi_epoch", lit(epochs > 1))
      .withColumn("registry_compacted",
        lit(sxmCompactions.getOrElse(tag, 0L) > 0L))
      .orderBy(col("doc_id"))
  }

  val qStreamCrossmodal = QueryDef(
    "q171_stream_crossmodal_registry",
    (s, dir) => ran.getOrElseUpdate(s"$dir/sxm",
      streamCrossmodalIngest(s, dir, n => math.max(1L, n / 7L), s"q171_$dir")),
    // the q170 oracle (CC over the union of exact-Jaccard text pairs and
    // payload-prefix-equal media pairs, keep-best election over the whole
    // cluster) restricted to the STREAMED docs (doc_id % 3 <> 0 on the
    // expanded fixture ids); registry_compacted is deterministically TRUE
    // (the relabel-batch dir count grows once per epoch, so the fold
    // trigger trips mid-stream at per = n/7 at every sf)
    Some(s"""WITH RECURSIVE
      base AS (SELECT doc_id, text FROM documents),
      dd AS (SELECT doc_id, text FROM base
        UNION ALL SELECT doc_id + 1000000, text FROM base WHERE doc_id % 7 = 0
        UNION ALL SELECT doc_id + 2000000,
          text || '${Catalog.CrossmodalFiller}' FROM base WHERE doc_id % 5 = 0),
      toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM dd),
      sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
          THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])
          ELSE [array_to_string(t, ' ')] END AS g FROM toks),
      sg AS (SELECT doc_id, unnest(g) AS g FROM sh),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sg GROUP BY doc_id),
      i AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
            FROM sg a JOIN sg b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
      tpairs AS (SELECT da AS a, db AS b
                FROM i JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
                WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.8),
      mpairs AS (SELECT a.doc_id AS a, b.doc_id AS b FROM dd a JOIN dd b
        ON md5(substr(a.text, 1, 200)) = md5(substr(b.text, 1, 200))
          AND a.doc_id < b.doc_id),
      edges AS (SELECT a, b FROM tpairs UNION SELECT b, a FROM tpairs
        UNION SELECT a, b FROM mpairs UNION SELECT b, a FROM mpairs),
      reach(v, w) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.v, e.b FROM reach r JOIN edges e ON r.w = e.a),
      cl AS (SELECT v AS doc_id, LEAST(v, MIN(w)) AS rep FROM reach GROUP BY v),
      m AS (SELECT d.doc_id,
          CAST(COALESCE(cl.rep, d.doc_id) AS BIGINT) AS cluster_id
        FROM dd d LEFT JOIN cl USING (doc_id)),
      q AS (SELECT doc_id, CAST(doc_id % 97 AS DOUBLE) AS quality FROM dd),
      best AS (SELECT cluster_id, doc_id AS rep_doc FROM (
          SELECT m.cluster_id, m.doc_id, row_number() OVER (
            PARTITION BY m.cluster_id ORDER BY q.quality DESC, m.doc_id) AS rn
          FROM m JOIN q USING (doc_id)) WHERE rn = 1)
      SELECT m.doc_id, m.cluster_id, CAST(best.rep_doc AS BIGINT) AS rep_doc,
        (m.doc_id = best.rep_doc) AS kept,
        CASE WHEN m.doc_id = best.rep_doc THEN CAST(-1 AS BIGINT)
             ELSE CAST(best.rep_doc AS BIGINT) END AS suppressed_by_rep,
        TRUE AS multi_epoch, TRUE AS registry_compacted
      FROM m JOIN best USING (cluster_id)
      WHERE m.doc_id % 3 <> 0 ORDER BY m.doc_id"""))

  val qStreamClusterRegistry = QueryDef(
    "q163_stream_cluster_registry",
    (s, dir) => ran.getOrElseUpdate(s"$dir/scr",
      streamClusterIngest(s, t(s, dir, "documents"),
        n => math.max(1L, n / 7L), s"q163_$dir")),
    // the registry's final state is CC over EVERY exact pair (see
    // streamClusterIngest) — the oracle replays transitive closure with
    // the q92 reach device, reps as the component minimum INCLUDING self;
    // registry_compacted is deterministically TRUE (the relabel-batch
    // counter grows once per epoch, so the batch-count trigger trips
    // mid-stream at per = n/7 regardless of bridge incidence)
    Some("""WITH RECURSIVE
      toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
          THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)])
          ELSE [array_to_string(t, ' ')] END AS g FROM toks),
      sg AS (SELECT doc_id, unnest(g) AS g FROM sh),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sg GROUP BY doc_id),
      i AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
            FROM sg a JOIN sg b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
      pairs AS (SELECT da AS a, db AS b
                FROM i JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
                WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.8),
      edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
      reach(v, w) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.v, e.b FROM reach r JOIN edges e ON r.w = e.a),
      cl AS (SELECT v AS doc_id, LEAST(v, MIN(w)) AS rep FROM reach GROUP BY v)
      SELECT d.doc_id, CAST(COALESCE(cl.rep, d.doc_id) AS BIGINT) AS rep,
        TRUE AS multi_epoch, TRUE AS registry_compacted
      FROM documents d LEFT JOIN cl USING (doc_id)
      WHERE d.doc_id % 3 <> 0
      ORDER BY d.doc_id"""))

  /** Streaming decontamination against an EVOLVING benchmark suite — the
    * missing streaming form of the q39/q47/q55/q116 batch family. The
    * benchmark is not fixed: release 1 is live before the crawl starts;
    * release 2 DROPS MID-STREAM (in data terms: once the stream reaches
    * doc_id >= R, R = 2/5 of the corpus id range — an in-band release
    * point, so the contract is a pure function of the data, not of the
    * epoch schedule). The gate owes the two answers a real pipeline owes:
    *
    *  - **go-forward**: a doc arriving at or after the release point is
    *    gated against the UNION (blocked with provenance `g2` when only
    *    the new release contaminates it);
    *  - **retroactive**: docs accepted BEFORE the release point and
    *    newly contaminated by release 2 are RECALLED from the published
    *    corpus into the audit set (`retro`) when the release folds — the
    *    [[graft.operators.ClusterRegistry]] relabel-log discipline
    *    applied to decontamination, served by
    *    [[graft.operators.DeconIndex.retro]] probing only the release's
    *    DELTA shingles.
    *
    * Schedule invariance (StreamingSpec property): the release folds in
    * whichever epoch first carries a doc past R, and a straddling batch
    * classifies per-doc (ids below R recall as `retro`, ids at/past R
    * block as `g2`), so the final corpus and the audit provenance are
    * identical under every maxPerTrigger slicing. The final corpus is
    * clean against the FULL union regardless of arrival time — only the
    * PROVENANCE (blocked at intake vs recalled) depends on where a doc
    * sat relative to the release point, and that is data, not schedule.
    *
    * Bounded state: the streaming query is STATELESS (foreachBatch); the
    * growing artifact is the committed-generation shingle index on disk
    * ([[graft.operators.DeconIndex]] — benchmark-sized, tiny next to the
    * corpus at any scale). The per-epoch collects are the gate's
    * documented test accumulators; at 100 TB the accepted set is a
    * published table and the retro recall is the same delta-shingle
    * anti-join run against it. */
  private[graft] val sdcG2 =
    new scala.collection.concurrent.TrieMap[String, Boolean]()

  /** One q172 epoch: publish-if-released → retro-recall → serve →
    * per-doc classify. Extracted so the replay spec drives the shipped
    * epoch logic through its own checkpoints. Returns (accepted
    * (doc_id, source, chars), audit (doc_id, source, bench_gen, kind),
    * recalled prior-epoch doc_ids).
    *
    * Replay boundary: the release fold is exactly-once — the in-JVM flag
    * short-circuits re-checks, and a fresh-JVM replay is caught by the
    * INDEX state ([[graft.operators.DeconIndex.publish]] no-ops when the
    * release is live), in which case the retro recall set was already
    * applied by the original run and the replayed epoch re-emits only
    * its own batch classification — byte-identical, because gen 2 was
    * already live when the original epoch classified. */
  private[graft] def sdcEpoch(root: String, dir: String, r: Long, tag: String,
      acceptedSoFar: () => Seq[Long])(batch: DataFrame, id: Long)
      : (Seq[(Long, String, Long)], Seq[(Long, String, Int, String)], Seq[Long]) = {
    import graft.operators.DeconIndex
    val bs = batch.sparkSession
    val mxRow = batch.agg(max(col("doc_id"))).head()
    if (mxRow.isNullAt(0)) return (Nil, Nil, Nil)
    val mx = mxRow.getLong(0)
    var recalled = Seq.empty[Long]
    if (mx >= r && !sdcG2.getOrElse(tag, false)) {
      if (DeconIndex.maxBenchGen(bs, root) < 2) {
        val bench2 = t(bs, dir, "documents")
          .filter(pmod(col("doc_id"), lit(13)) === 8)
        DeconIndex.publish(bs, root, bench2, "text", 6, benchGen = 2)
        val ids = acceptedSoFar()
        if (ids.nonEmpty) {
          import bs.implicits._
          val accDocs = t(bs, dir, "documents")
            .join(ids.toDF("doc_id"), Seq("doc_id"), "left_semi")
          recalled = DeconIndex.retro(bs, root, accDocs, "doc_id", "text", 6,
            benchGen = 2).collect().toSeq.map(_.getLong(0))
        }
      }
      sdcG2.update(tag, true)
    }
    val contam = DeconIndex.serve(bs, root, batch, "doc_id", "text", 6)
    val cls = batch.join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("chars"),
        when(col("contam_gen") === 1, lit("g1"))
          .when(col("contam_gen") === 2 && col("doc_id") >= r, lit("g2"))
          .when(col("contam_gen") === 2, lit("retro"))
          .otherwise(lit("acc")).as("k"))
      .collect().toSeq
    val acc = cls.filter(_.getString(3) == "acc")
      .map(r2 => (r2.getLong(0), r2.getString(1), r2.getLong(2)))
    val aud = cls.filter(_.getString(3) != "acc").map { r2 =>
      val k = r2.getString(3)
      (r2.getLong(0), r2.getString(1), if (k == "g1") 1 else 2,
        if (k == "retro") "retro" else "intake")
    }
    (acc, aud, recalled)
  }

  private[graft] def streamDeconIngest(s: SparkSession, dir: String,
      perOf: Long => Long, tag: String): DataFrame = {
    import s.implicits._
    import graft.operators.DeconIndex
    val uri = s"hub:sdc_$tag"
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-sdc-idx-" +
      s"${java.lang.ProcessHandle.current().pid()}-" +
      java.lang.Integer.toHexString(tag.hashCode)
    val docs = t(s, dir, "documents")
    val r = docs.agg(max(col("doc_id"))).head().getLong(0) * 2L / 5L
    DeconIndex.seed(s, root,
      docs.filter(pmod(col("doc_id"), lit(13)) === 3), "text", 6)
    sdcG2.remove(tag): Unit
    val train = docs.filter(!pmod(col("doc_id"), lit(13)).isin(3, 8))
    val rows = train.select(col("doc_id"), col("source"), col("text"))
      .orderBy(col("doc_id")).collect()
    MemHub.publish(uri, "docs", rows.iterator.map { r2 =>
      val payload =
        s"""{"source":${jsonStr(r2.getString(1))},"text":${jsonStr(r2.getString(2))}}"""
      (r2.getLong(0).toString, Map.empty[String, String], r2.getLong(0),
        payload.getBytes("UTF-8"))
    })
    val per = perOf(rows.length.toLong)
    val stream = s.readStream.format("graft-topic")
      .option("profile", "pulsar").option("uri", uri).option("topics", "docs")
      .option("maxPerTrigger", per.toString)
      .load()
      .select(col("key").cast("long").as("doc_id"),
        from_json(col("value").cast("string"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "source STRING, text STRING")).as("j"))
      .select(col("doc_id"), col("j.source").as("source"), col("j.text").as("text"))
    val accepted = scala.collection.mutable.LinkedHashMap.empty[Long, (String, Long)]
    val audit = scala.collection.mutable.LinkedHashMap.empty[Long, (String, Int, String)]
    var epochs = 0L
    val cp = s"${System.getProperty("java.io.tmpdir")}/graft-sdc-cp-" +
      s"${java.lang.ProcessHandle.current().pid()}-" +
      java.lang.Integer.toHexString(tag.hashCode)
    awaitIntake(s"q172:$tag", cpv => stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", cpv)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val (acc, aud, recalled) = sdcEpoch(root, dir, r, tag,
          () => synchronized { accepted.keys.toSeq })(batch, id)
        synchronized {
          epochs = math.max(epochs, id + 1)
          recalled.foreach { i =>
            accepted.remove(i).foreach { case (src, _) =>
              audit.update(i, (src, 2, "retro"))
            }
          }
          acc.foreach { case (i, src, ch) => accepted.update(i, (src, ch)) }
          aud.foreach { case (i, src, g, kind) => audit.update(i, (src, g, kind)) }
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start(), cp, () => synchronized { epochs })
    DeconIndex.drop(s, root)
    sdcG2.remove(tag): Unit
    val out =
      accepted.toSeq.map { case (i, (src, ch)) => (i, src, ch, "acc") } ++
      audit.toSeq.map { case (i, (src, g, kind)) =>
        (i, src, 0L, if (kind == "retro") "retro" else if (g == 1) "g1" else "g2")
      }
    out.toDF("doc_id", "source", "chars", "k")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_in"),
        sum(when(col("k") === "acc", 1L).otherwise(0L)).as("n_accepted"),
        sum(when(col("k") === "g1", 1L).otherwise(0L)).as("n_blocked_g1"),
        sum(when(col("k") === "g2", 1L).otherwise(0L)).as("n_blocked_g2"),
        sum(when(col("k") === "retro", 1L).otherwise(0L)).as("n_retro"),
        sum(when(col("k") === "acc", col("chars")).otherwise(0L))
          .as("n_chars_accepted"))
      .withColumn("multi_epoch", lit(epochs > 1))
      .orderBy(col("source"))
  }

  val qStreamDeconIngest = QueryDef(
    "q172_stream_decon_ingest",
    (s, dir) => ran.getOrElseUpdate(s"$dir/sdc",
      streamDeconIngest(s, dir, n => math.max(1L, n / 7L), s"q172_$dir")),
    // the final corpus and audit provenance are schedule-invariant (see
    // streamDeconIngest), so the replay needs no epoch simulation: a
    // train doc is blocked-g1 when it shares a 6-gram with release 1,
    // blocked-g2 when only release 2 contaminates it and it arrived at
    // or after the release point R = 2/5 of the id range, and
    // retro-recalled when only release 2 contaminates it and it arrived
    // before R. String shingles in the oracle ≡ xxhash64 shingles
    // engine-side (the q55 assumption).
    Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      sh AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 6
          THEN list_distinct([array_to_string(t[i:i+5], ' ') for i in range(1, len(t) - 4)])
          ELSE [array_to_string(t, ' ')] END) AS g FROM toks),
      b1 AS (SELECT DISTINCT g FROM sh WHERE doc_id % 13 = 3),
      b2 AS (SELECT DISTINCT g FROM sh WHERE doc_id % 13 = 8),
      rr AS (SELECT max(doc_id) * 2 // 5 AS r FROM documents),
      c1 AS (SELECT DISTINCT doc_id FROM sh
             WHERE doc_id % 13 NOT IN (3, 8) AND g IN (SELECT g FROM b1)),
      c2 AS (SELECT DISTINCT doc_id FROM sh
             WHERE doc_id % 13 NOT IN (3, 8) AND g IN (SELECT g FROM b2)),
      cls AS (SELECT d.source, length(d.text) AS chars,
          CASE WHEN d.doc_id IN (SELECT doc_id FROM c1) THEN 'g1'
               WHEN d.doc_id IN (SELECT doc_id FROM c2)
                    AND d.doc_id >= (SELECT r FROM rr) THEN 'g2'
               WHEN d.doc_id IN (SELECT doc_id FROM c2) THEN 'retro'
               ELSE 'acc' END AS k
        FROM documents d WHERE d.doc_id % 13 NOT IN (3, 8))
      SELECT source,
        CAST(COUNT(*) AS BIGINT) AS n_in,
        CAST(SUM(CASE WHEN k = 'acc' THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
        CAST(SUM(CASE WHEN k = 'g1' THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked_g1,
        CAST(SUM(CASE WHEN k = 'g2' THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked_g2,
        CAST(SUM(CASE WHEN k = 'retro' THEN 1 ELSE 0 END) AS BIGINT) AS n_retro,
        CAST(SUM(CASE WHEN k = 'acc' THEN chars ELSE 0 END) AS BIGINT) AS n_chars_accepted,
        TRUE AS multi_epoch
      FROM cls GROUP BY source ORDER BY source"""))

  /** Session-scoped q175 stream+index state (the q166 keying: the served
    * frame lazily READS the persisted index, so it is bound to the
    * session that built it; stopped-session entries evict on access). */
  private val ranBm25Ingest =
    new scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()

  /** q175 — the persisted BM25 postings index maintained IN-STREAM
    * ([[graft.operators.RetrievalIndex]], q174's batch lifecycle composed
    * with the q159/q167/q172 ingest discipline): the index is built over
    * the mod-3=0 third of the corpus, the rest arrives as a rate-limited
    * stream whose every epoch folds into the index as a committed append
    * batch keyed by the epoch id — replayed in-epoch once to prove the
    * sentinel makes retries no-ops — and the post-intake serve must be
    * BIT-identical to fresh BM25 over the ENTIRE corpus (the q113/q174
    * oracle verbatim): df/idf re-derive from live postings, so no epoch
    * boundary can leave a score stale. The serve itself stays lazy, so a
    * bench rep times the steady-state query path, not the fixture. */
  private[graft] def streamBm25Ingest(s: SparkSession, dir: String,
      perOf: Long => Long, tag: String): DataFrame = {
    import s.implicits._
    import graft.operators.RetrievalIndex
    val uri = s"hub:sbm_$tag"
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-sbm-idx-" +
      s"${java.lang.ProcessHandle.current().pid()}-" +
      java.lang.Integer.toHexString(tag.hashCode)
    val docs = t(s, dir, "documents")
    RetrievalIndex.build(
      docs.filter(pmod(col("doc_id"), lit(3)) === 0), "doc_id", "text", root)
    val train = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val rows = train.select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).collect()
    MemHub.publish(uri, "docs", rows.iterator.map { r =>
      val payload = s"""{"text":${jsonStr(r.getString(1))}}"""
      (r.getLong(0).toString, Map.empty[String, String], r.getLong(0),
        payload.getBytes("UTF-8"))
    })
    val per = perOf(rows.length.toLong)
    val stream = s.readStream.format("graft-topic")
      .option("profile", "pulsar").option("uri", uri).option("topics", "docs")
      .option("maxPerTrigger", per.toString)
      .load()
      .select(col("key").cast("long").as("doc_id"),
        from_json(col("value").cast("string"),
          org.apache.spark.sql.types.StructType.fromDDL("text STRING"))
          .getField("text").as("text"))
    var epochs = 0L
    val cp = s"${System.getProperty("java.io.tmpdir")}/graft-sbm-cp-" +
      s"${java.lang.ProcessHandle.current().pid()}-" +
      java.lang.Integer.toHexString(tag.hashCode)
    awaitIntake(s"q175:$tag", cpv => stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", cpv)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val b = batch.select(col("doc_id"), col("text"))
        RetrievalIndex.append(b, "doc_id", "text", root, s"e$id")
        // immediate replay of the same epoch: the _DONE sentinel must
        // make it a no-op, or the oracle equality below breaks on tf/df
        RetrievalIndex.append(b, "doc_id", "text", root, s"e$id")
        synchronized { epochs = math.max(epochs, id + 1) }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start(), cp, () => synchronized { epochs })
    val st = RetrievalIndex.staleness(s, root).head()
    val flags = Seq((st.getLong(0), st.getLong(1), epochs > 1))
      .toDF("built_rows", "appended_rows", "multi_epoch")
    RetrievalIndex.topK(docs.filter(col("doc_id") < 3),
        "doc_id", "text", root, k = 5)
      .crossJoin(flags)
      .orderBy(col("query_id"), col("rnk"))
  }

  val qStreamBm25Ingest = QueryDef(
    "q175_stream_bm25_ingest",
    (s, dir) => {
      ranBm25Ingest.keysIterator
        .filter(k => (k._1 ne s) && k._1.sparkContext.isStopped)
        .foreach(ranBm25Ingest.remove)
      ranBm25Ingest.getOrElseUpdate((s, s"$dir/sbm"),
        streamBm25Ingest(s, dir, n => math.max(1L, n / 6L), s"q175_$dir"))
    },
    // fresh BM25 over the whole corpus (the q113/q174 SQL verbatim):
    // base third indexed at build, streamed two-thirds folded per epoch,
    // serve must equal the batch formulation exactly
    Some("""WITH ct AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM documents),
      dl AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl FROM ct),
      st AS (SELECT CAST(SUM(dl) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS n FROM dl),
      p AS (SELECT doc_id, unnest(l) AS term FROM ct),
      pf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM p GROUP BY doc_id, term),
      dfr AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM pf GROUP BY term),
      q0 AS (SELECT doc_id AS query_id, unnest(string_split_regex(trim(text), '\s+')) AS term
             FROM documents WHERE doc_id < 3),
      qt AS (SELECT DISTINCT query_id, term FROM q0),
      idf AS (SELECT term,
               4096 + (2 * (SELECT n FROM st) - 2 * df + 1) * 4096 // (2 * df + 1) AS r
              FROM dfr),
      idfq AS (SELECT term,
               (length(bin(r)) - 1) * 16 + ((r * 16) >> (length(bin(r)) - 1)) - 16 - 192 AS idf_q
              FROM idf),
      sc AS (SELECT qt.query_id, pf.doc_id,
               CAST(SUM(idfq.idf_q *
                 ((44 * pf.tf * st.t * 16) //
                  (20 * pf.tf * st.t + 6 * st.t + 18 * dl.dl * st.n))) AS BIGINT) AS score
             FROM qt
             JOIN pf ON qt.term = pf.term
             JOIN idfq ON qt.term = idfq.term
             JOIN dl ON dl.doc_id = pf.doc_id
             CROSS JOIN st
             GROUP BY qt.query_id, pf.doc_id),
      r AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
            FROM sc WHERE score > 0),
      lc AS (SELECT
          CAST(COUNT(CASE WHEN doc_id % 3 = 0 AND text IS NOT NULL THEN 1 END) AS BIGINT) AS built_rows,
          CAST(COUNT(CASE WHEN doc_id % 3 <> 0 AND text IS NOT NULL THEN 1 END) AS BIGINT) AS appended_rows
        FROM documents)
      SELECT query_id, CAST(rnk AS INTEGER) AS rnk, doc_id, score,
        lc.built_rows, lc.appended_rows, TRUE AS multi_epoch
      FROM r CROSS JOIN lc WHERE rnk <= 5 ORDER BY query_id, rnk"""))

  /** Minimal JSON string escaper for the seeded payloads (the corpus text
    * is plain ASCII-ish but quotes/backslashes/newlines must survive the
    * round-trip exactly — md5(text) is part of the decontamination key). */
  private[graft] def jsonStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append("\"").toString
  }

  val all: Seq[QueryDef] = Seq(qStreamRolling, qStreamDedup, qStreamWindow,
    qMapService, qStreamSessions, qStreamJoin, qStreamEnrich, qStreamOuterJoin,
    qStreamCurate, qStreamDedupIngest, qStreamSemanticIngest,
    qStreamClusterRegistry, qStreamPhashIngest, qStreamCrossmodal,
    qStreamDeconIngest, qStreamBm25Ingest)
}
