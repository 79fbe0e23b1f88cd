package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.{Dedup, Pipeline, Similarity}
import graft.streaming.Sessionize
import graft.tools.StressData

/** The adversarial 10×-sf0.1 scale/skew gate: every scale-sensitive
  * operator runs on [[StressData]]'s hostile corpus (hot language, hot
  * dedup block, bot user, planted near-dups) asserting BOTH unchanged
  * values against an independent formulation AND bounded per-partition
  * work — no task's shuffle-read exceeds a small multiple of the median,
  * measured with a real task-metrics listener. This converts "no
  * scale-killer by inspection" into "no scale-killer by test". */
class ScaleStressSpec extends AnyFunSuite {
  lazy val spark = {
    val sp = GraftSession.local(8)
    // at 50k-row test scale AQE coalesces every exchange to ONE partition
    // (bytes << 64 MB advisory) and the balance audit would see a single
    // task by construction; a small advisory size preserves the
    // multi-partition layout the same plan has at 100 TB
    sp.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    sp
  }
  private lazy val dir = StressData.ensure(spark)

  /** Collects per-task shuffle-read record counts while `action` runs,
    * grouped by stage; asserts that in every stage moving real data
    * (≥ minTasks tasks, ≥ minRecords records) the hottest task reads at
    * most `factor` × the stage median. A hot key concentrating a group
    * onto one task shows up as max ≈ total (32× median at 32 partitions)
    * — far outside any factor here. */
  private def assertBalanced[T](label: String, factor: Double = 6.0,
      minTasks: Int = 4, minRecords: Long = 50000L)(action: => T): T = {
    val perStage = new scala.collection.concurrent.TrieMap[Int, List[Long]]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        // a task's data intake is whichever side feeds it: exchange reads
        // for shuffle stages, source records for scan stages (an ANN probe
        // moves data through a pruned scan + broadcast, never a shuffle)
        val recs = Option(t.taskMetrics).map(m =>
          math.max(m.shuffleReadMetrics.recordsRead,
            m.inputMetrics.recordsRead)).getOrElse(0L)
        perStage.updateWith(t.stageId) {
          case Some(l) => Some(recs :: l)
          case None => Some(recs :: Nil)
        }: Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val out =
      try action
      finally {
        // listener bus is async and its flush API is private: poll until
        // the captured event count is stable
        var last = -1L
        var stable = 0
        var waited = 0
        while (stable < 2 && waited < 3000) {
          val now = perStage.values.map(_.length.toLong).sum
          if (now == last) stable += 1 else stable = 0
          last = now
          Thread.sleep(100); waited += 100
        }
        spark.sparkContext.removeSparkListener(listener)
      }
    val audited = perStage.toSeq.filter { case (_, recs) =>
      recs.length >= minTasks && recs.sum >= minRecords
    }
    assert(audited.nonEmpty,
      s"$label: no stage moved >= $minRecords records — the stress " +
        "input did not exercise the operator's shuffle; saw " +
        perStage.toSeq.sortBy(_._1).map { case (s, rs) =>
          s"stage $s: ${rs.length} tasks, ${rs.sum} recs"
        }.mkString("[", "; ", "]"))
    audited.foreach { case (stage, recs) =>
      val sorted = recs.sorted
      val median = math.max(1L, sorted(sorted.length / 2))
      val max = sorted.last
      assert(max <= factor * median,
        s"$label stage $stage: hottest task read $max records vs " +
          s"median $median (> ${factor}x) over ${recs.length} tasks — " +
          "per-partition work is NOT bounded under skew")
    }
    out
  }

  test("selectToBudget: hot 80% language group — balanced AND equal to sequential greedy") {
    val docs = Tables.load(spark, dir, "documents")
    val budget = 400000L
    val kept = assertBalanced("selectToBudget") {
      Pipeline.selectToBudget(docs, "lang", "doc_id",
          col("n_chars").cast("double"), col("n_chars"), budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    // sequential reference: greedy per group by (-quality, id) on the driver
    val ref = docs.select("lang", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        var cum = 0L
        rows.sortBy { case (_, id, n) => (-n.toDouble, id) }.flatMap { case (_, id, n) =>
          val keep = if (cum < budget) Some(id) else None
          cum += n
          keep
        }
      }.toSet
    assert(kept == ref,
      s"budget selection diverged: ${(kept -- ref).size} extra, ${(ref -- kept).size} missing")
  }

  test("packSequences: hot group packs correctly at any parallelism, balanced") {
    val docs = Tables.load(spark, dir, "documents")
    val packed = assertBalanced("packSequences") {
      Pipeline.packSequences(docs, "doc_id", "text", "lang", budget = 4096)
        .select("doc_id", "bin").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(packed.size == StressData.Docs)
    // replay at parallelism 1: identical bin assignment (pure function of
    // the total order, never of partition boundaries)
    val replay = Pipeline.packSequences(docs.repartition(1), "doc_id", "text",
        "lang", budget = 4096)
      .select("doc_id", "bin").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed == replay, "bin assignment changed with input parallelism")
  }

  test("minhashLsh: hot dedup block stays bucketed — balanced, planted dups found") {
    // the 12k-doc slice keeps the FULL hot block plus a diverse tail: the
    // skew shape is intact, and near-dup pair enumeration (output itself
    // is quadratic in the duplicate-set size) stays test-sized
    val docs = Tables.load(spark, dir, "documents").filter(col("doc_id") < 12000)
    val pairs = assertBalanced("minhashLsh", factor = 8.0) {
      Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.7)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    // the hot block is 4000 near-identical docs: its duplicate pairs must
    // surface (sampled check: consecutive block members share 39/40 tokens
    // only when their perturbed slot matches — require a healthy count)
    val inBlock = pairs.count { case (a, b) =>
      a < StressData.HotBlock && b < StressData.HotBlock
    }
    assert(inBlock > 1000, s"hot-block duplicate pairs: $inBlock (expected > 1000)")
  }

  test("minhashLsh oversized-candidate fallback: shuffle semi-join path, balanced and pair-identical") {
    // the r8 verdict's scale guard (what's wrong #3), proven AT the skew
    // gate's scale: with the broadcast ceiling forced to 0 the verify
    // path's candidate semi-joins take the shuffle dispatch — the path a
    // 100 TB dup-heavy corpus lands on when its candidate-id set outgrows
    // any broadcast budget. The hot dedup block (4000 near-identical
    // docs, a dense candidate graph) must still enumerate the SAME pairs
    // with balanced tasks, where the old unconditional broadcast(ids)
    // would simply have died past the ceiling.
    val docs = Tables.load(spark, dir, "documents").filter(col("doc_id") < 12000)
    val broadcastPairs = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val saved = Dedup.maxBroadcastIdBytes
    val shufflePairs =
      try {
        Dedup.maxBroadcastIdBytes = 0L
        assertBalanced("minhashLsh-shuffle-fallback", factor = 8.0) {
          Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.7)
            .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
        }
      } finally Dedup.maxBroadcastIdBytes = saved
    assert(shufflePairs.length == broadcastPairs.length &&
      shufflePairs.sameElements(broadcastPairs),
      s"fallback dispatch changed results: ${shufflePairs.length} vs ${broadcastPairs.length} pairs")
  }

  test("charNgramPairs: hot block diverts to the guarded path — balanced") {
    val docs = Tables.load(spark, dir, "documents").filter(col("doc_id") < 12000)
    val pairs = assertBalanced("charNgramPairs", factor = 8.0) {
      Dedup.charNgramPairs(docs, "doc_id", "text", "lang", threshold = 0.8)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    val inBlock = pairs.count { case (a, b) =>
      a < StressData.HotBlock && b < StressData.HotBlock
    }
    assert(inBlock > 1000, s"hot-block near-dup pairs: $inBlock (expected > 1000)")
  }

  test("containmentPairs: hot near-identical block — balanced; quadratic output counted, not collected") {
    val docs = Tables.load(spark, dir, "documents").filter(col("doc_id") < 12000)
    // the hot block makes containment's output itself quadratic (every
    // directed hot pair shares 32+/38 shingles at one perturbed token in
    // 40) — count inside the producing stage, never materialize the edges
    val n = assertBalanced("containmentPairs", factor = 8.0) {
      Dedup.containmentPairs(docs, "doc_id", "text", "lang",
        shingleSize = 3, threshold = 0.8).count()
    }
    // lang splits the 1200-doc block 80/20: directed same-lang hot pairs
    // alone are ~960·959 + 240-side pairs ≈ 978k — require the bulk found
    assert(n > 900000L, s"hot-block directed containment pairs: $n")
  }

  test("sessionsBatchScalable: bot's 120k-event session — balanced, equal to window formulation") {
    val events = Tables.load(spark, dir, "events")
    val scalable = assertBalanced("sessionsBatchScalable", factor = 6.0) {
      Sessionize.sessionsBatchScalable(events, gapMs = 600000L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    }
    val windowed = Sessionize.sessionsBatch(events, gapMs = 600000L)
      .select("userId", "startMs", "endMs", "nEvents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(scalable == windowed,
      s"sessionization diverged: ${(scalable -- windowed).size} extra, " +
        s"${(windowed -- scalable).size} missing of ${windowed.size}")
    // the bot's single unbroken session survives intact across partitions
    val bot = scalable.filter(_._1 == 0L)
    assert(bot.size == 1 && bot.head._4 == StressData.BotEvents,
      s"bot session wrong: $bot")
  }

  test("transitionCounts: bot's 120k-event burst — balanced, equal to window formulation") {
    val events = Tables.load(spark, dir, "events")
    val scalable = assertBalanced("transitionCounts", factor = 6.0) {
      graft.operators.Events.transitionCounts(
          events, "user_id", "ts", "event_id", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    }
    // independent value proof: the per-user lag window (the formulation
    // whose hot key WOULD land one task) produces identical counts
    val windowed = graft.operators.Events.transitionCountsWindow(
        events, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(scalable == windowed,
      s"transition matrix diverged: ${(scalable -- windowed).size} extra, " +
        s"${(windowed -- scalable).size} missing of ${windowed.size}")
    // the bot contributes BotEvents-1 transitions; with them the total
    // transition mass must dominate the user count — proves the hot key
    // actually flowed through the balanced path
    val total = scalable.toSeq.map(_._3).sum
    assert(total >= StressData.BotEvents - 1,
      s"only $total transitions — bot burst missing from the input")
  }

  test("capPerDomain: 80%-hot domain stays balanced — bounded-heap cut, equal to window formulation") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    // hostile URL layout: 80% of the corpus on ONE registrable domain
    // (a crawl-heavy aggregator), the rest spread over ~1k sites
    val withUrl = docs.withColumn("url",
      when(pmod(xxhash64(col("doc_id")), lit(10)) < 8,
        concat(lit("https://Hot.Example.COM/p/"), col("doc_id").cast("string")))
        .otherwise(concat(lit("https://site"),
          pmod(col("doc_id"), lit(1000)).cast("string"),
          lit(".org/p/"), col("doc_id").cast("string"))))
    val capped = assertBalanced("capPerDomain", factor = 6.0) {
      graft.operators.Pipeline.capPerDomain(withUrl, "doc_id", "url",
          col("n_chars"), k = 5)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    }
    // independent value proof: the per-domain row_number window (whose
    // hot key WOULD land one task) keeps the identical documents
    val domain = graft.functions.url_parts(col("url"))
      .getField("registrable_domain")
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("q").desc, col("doc_id").asc)
    val windowed = withUrl
      .select(domain.as("domain"), col("doc_id").cast("long").as("doc_id"),
        col("n_chars").cast("long").as("q"))
      .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rnk") <= 5)
      .collect().map(r => (r.getString(0), r.getInt(3), r.getLong(1))).toSet
    assert(capped == windowed,
      s"capPerDomain diverged: ${(capped -- windowed).size} extra, " +
        s"${(windowed -- capped).size} missing of ${windowed.size}")
    assert(capped.count(_._1 == "example.com") == 5,
      "the hot domain must be capped to exactly k docs")
  }

  test("intervalOverlapJoin keyed: single-bin pileup shatters across keys — balanced, equal to unkeyed") {
    import spark.implicits._
    // a peak hour: 60k intervals per side, ALL inside one 1h bin, spread
    // over 1k hosts — the unkeyed join would do 60k x 60k on ONE task;
    // the keyed join shuffles on (host, bin) and stays balanced. A few
    // bin-crossing stragglers keep the canonical-bin emission honest.
    val binMs = 3600000L
    def side(prefix: String) = (0 until 60000).map { i =>
      val s = (i.toLong * 37) % binMs
      val e = math.min(s + 1000L + (i % 7) * (binMs / 4), binMs * 3 / 2 + i % 13)
      (i.toLong % 1000L, s, e)
    }
    val l = side("l").toDF("host", "ls", "le")
    val r = side("r").toDF("rhost", "rs", "re")
    // at corpus scale neither side broadcasts — disable the threshold so
    // the audited plan is the 100 TB one (shuffle join on (key, bin)),
    // not a test-scale BroadcastHashJoin with no exchange to measure
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // the 4-long-column fixture compresses to ~150 KB of shuffle, under
    // AQE's 1 MB minPartitionSize — it would coalesce to 1-2 tasks and
    // leave nothing to audit; keep the initial hash layout instead (the
    // (key, bin) balance across tasks IS the thing under test)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val keyed =
      try assertBalanced("intervalOverlapJoin keyed", factor = 6.0) {
        graft.operators.Temporal.intervalOverlapJoin(
            l, r, "ls", "le", "rs", "re", binMs,
            leftKey = Some("host"), rightKey = Some("rhost"))
          .count()
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
      }
    assert(keyed > 0, "pileup fixture must produce overlaps")
    // value proof on a slice the unkeyed (hot) formulation can afford:
    // keyed == unkeyed-then-key-filtered, tuple for tuple
    val lS = l.filter($"host" < 20)
    val rS = r.filter($"rhost" < 20)
    def collectSet(df: org.apache.spark.sql.DataFrame) = df
      .select("host", "ls", "le", "rhost", "rs", "re")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5))).toSeq.sorted
    val keyedSlice = collectSet(graft.operators.Temporal.intervalOverlapJoin(
      lS, rS, "ls", "le", "rs", "re", binMs,
      leftKey = Some("host"), rightKey = Some("rhost")))
    val unkeyedSlice = collectSet(graft.operators.Temporal.intervalOverlapJoin(
        lS, rS, "ls", "le", "rs", "re", binMs)
      .filter($"host" === $"rhost"))
    assert(keyedSlice == unkeyedSlice,
      s"keyed diverged from unkeyed+filter: ${keyedSlice.size} vs ${unkeyedSlice.size}")
  }

  test("lshTopK + ivfTopKFromIndex: planted near-dups found at bounded scan, balanced") {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 100 && col("vec_id") % 2 === 0)
    // IVF auto-scale: nlist = 4*sqrt(20000) = 566 lists; nprobe 28 ~ 5% scan
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-stress-ivf-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    Similarity.buildIvfIndex(emb, path, "vec_id", "embedding")
    val nlist = spark.read.parquet(s"${Similarity.ivfCurrent(spark, path)}/meta").select("nlist").head().getInt(0)
    assert(nlist == Similarity.autoNlist(StressData.Vecs), s"auto nlist: $nlist")
    // factor 10: probe-scan task size is the probed LIST size, and list
    // sizes legitimately spread with the data's cluster-mass distribution
    // (566 centroids over 200 planted topics). The audit pins the spread
    // single-digit — a key-concentration bug would read a corpus-scale
    // list (50x+ median), not a fat cluster
    val ann = assertBalanced("ivfTopKFromIndex", factor = 10.0, minRecords = 500L) {
      Similarity.ivfTopKFromIndex(path, queries, "vec_id", "embedding",
          k = 10, nprobe = math.max(8, nlist / 20))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    }
    // every even planted vector's top-10 must contain its planted twin
    val planted = ann.filter(_._1 < 2L * StressData.PlantedPairs)
    val hit = planted.count { case (q, ns) => ns.contains(q + 1) }
    val recall = hit.toDouble / planted.size
    assert(recall >= 0.8,
      f"IVF@~5%% scan planted-twin recall $recall%.2f below 0.8 (nlist=$nlist)")
    val lsh = Similarity.lshTopK(queries, emb, "vec_id", "embedding",
      "vec_id", "embedding", k = 10)
    val lshMap = lsh.collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val lshPlanted = lshMap.filter(_._1 < 2L * StressData.PlantedPairs)
    val lshHit = lshPlanted.count { case (q, ns) => ns.contains(q + 1) }
    assert(lshHit.toDouble / math.max(1, lshPlanted.size) >= 0.8,
      s"LSH planted-twin recall ${lshHit.toDouble / lshPlanted.size}")
  }

  test("ANN at 10x: 200k x 64d through distributed-Lloyd auto-nlist IVF and PQ — " +
      "sqrt-N scan trend, balanced serve, planted recall") {
    val bigDir = StressData.ensureBig(spark)
    val emb = Tables.load(spark, bigDir, "embeddings")
    assert(emb.count() == StressData.BigVecs)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-stress-ivf-big-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    Similarity.buildIvfIndex(emb, path, "vec_id", "embedding")
    val nlist = spark.read.parquet(s"${Similarity.ivfCurrent(spark, path)}/meta").select("nlist").head().getInt(0)
    // sqrt-N trend: 4*sqrt(200k) = 1789 (vs 566 at 20k) — and 1789*64 >
    // the distributed-Lloyd threshold, so this build trained on executors
    assert(nlist == Similarity.autoNlist(StressData.BigVecs), s"auto nlist: $nlist")
    assert(nlist * 64 > Similarity.DistributedLloydSampleThreshold,
      "the big build must exercise the distributed-Lloyd path")

    // planted-twin recall at the ~5% scan point, serve balance audited
    val queries = emb.filter(col("vec_id") < 200 && col("vec_id") % 2 === 0)
    val nprobe = math.max(8, nlist / 20)
    val ann = assertBalanced("ivfTopKFromIndex@200k", factor = 10.0, minRecords = 500L) {
      Similarity.ivfTopKFromIndex(path, queries, "vec_id", "embedding",
          k = 10, nprobe = nprobe)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    }
    val hit = ann.count { case (q, ns) => ns.contains(q + 1) }
    val recall = hit.toDouble / ann.size
    assert(recall >= 0.8,
      f"IVF@~5%% scan planted-twin recall $recall%.2f below 0.8 at 200k (nlist=$nlist)")

    // sqrt-N SCAN pin, measured not estimated: a single-query probe reads
    // <= 7% of the corpus from the pruned lists scan (nprobe/nlist = 5%
    // nominal; fat clusters allow slack)
    val one = Similarity.ivfTopKFromIndex(path,
      emb.filter(col("vec_id") === 4000), "vec_id", "embedding",
      k = 10, nprobe = nprobe)
    one.count()
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case sc: FileSourceScanExec => Seq(sc)
        case other => other.children.flatMap(scans)
      }
    val listScan = scans(one.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("graft-stress-ivf-big")))
    assert(listScan.nonEmpty, "expected a pruned parquet scan over the big index lists")
    val scanned = listScan.map(_.metrics("numOutputRows").value).sum
    assert(scanned <= (0.07 * StressData.BigVecs).toLong,
      s"single-query probe scanned $scanned of ${StressData.BigVecs} rows (> 7%)")

    // IVF-PQ at 200k: byte-code lists + ADC serve, balance green, exact
    // rerank recovers the planted twins
    val pqPath = s"$path-pq"
    Similarity.buildIvfPqIndex(emb, pqPath, "vec_id", "embedding")
    val pq = assertBalanced("ivfPqTopK@200k", factor = 10.0, minRecords = 500L) {
      Similarity.ivfPqTopK(pqPath, queries, "vec_id", "embedding",
          k = 10, nprobe = nprobe, rerank = 40,
          exact = emb, exactId = "vec_id", exactVec = "embedding")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    }
    val pqHit = pq.count { case (q, ns) => ns.contains(q + 1) }
    val pqRecall = pqHit.toDouble / pq.size
    assert(pqRecall >= 0.8,
      f"IVF-PQ planted-twin recall $pqRecall%.2f below 0.8 at 200k")
  }

  test("bm25TopK on the hostile corpus: balanced, and exactly equal to a driver-side replay") {
    val docs = Tables.load(spark, dir, "documents")
    val queries = docs.filter(col("doc_id").isin(0L, 600L, 30000L)) // hot block x2 + tail
    val got = assertBalanced("bm25TopK", factor = 8.0, minRecords = 50000L) {
      Pipeline.bm25TopK(queries, docs, "doc_id", "text", "doc_id", "text", k = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    }
    assert(got.nonEmpty && got.map(_._1).distinct.length == 3)

    // independent sequential replay of the exact integer arithmetic
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    def toks(t: String): Seq[String] =
      t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    val dl = rows.map { case (id, t) => id -> toks(t).length.toLong }.toMap
    val bigT = dl.values.sum
    val n = rows.length.toLong
    val tf = scala.collection.mutable.HashMap.empty[(Long, String), Long]
    rows.foreach { case (id, t) => toks(t).foreach(w => tf((id, w)) = tf.getOrElse((id, w), 0L) + 1) }
    val df_ = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def qlog2(x: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      e * 16 + ((x * 16) >> e) - 16
    }
    def idfQ(d: Long): Long = qlog2(4096L + (2 * n - 2 * d + 1) * 4096L / (2 * d + 1)) - 192L
    val qdocs = Map(0L -> rows.find(_._1 == 0L).get._2,
      600L -> rows.find(_._1 == 600L).get._2, 30000L -> rows.find(_._1 == 30000L).get._2)
    val expect = qdocs.toSeq.flatMap { case (qid, qt) =>
      val terms = toks(qt).distinct
      val scores = rows.map(_._1).map { d =>
        d -> terms.map { t =>
          val f = tf.getOrElse((d, t), 0L)
          if (f == 0) 0L
          else idfQ(df_(t)) * ((44 * f * bigT * 16) / (20 * f * bigT + 6 * bigT + 18 * dl(d) * n))
        }.sum
      }.filter(_._2 > 0)
      scores.sortBy { case (d, sc) => (-sc, d) }.take(10).zipWithIndex.map {
        case ((d, sc), i) => (qid, i + 1, d, sc)
      }
    }.toSet
    assert(got.toSet == expect,
      s"bm25 diverged from the sequential replay: ${(got.toSet -- expect).take(3)} vs ${(expect -- got.toSet).take(3)}")
  }

  test("ccnetBuckets on the 80%-hot language: balanced — no per-language sort — and boundary-exact") {
    val docs = Tables.load(spark, dir, "documents")
    val got = assertBalanced("ccnetBuckets", factor = 8.0) {
      Pipeline.ccnetBuckets(docs, "doc_id", "text", "lang", vocabSize = 64)
        .select("doc_id", "lang", "q", "bucket")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    }
    assert(got.length == StressData.Docs)
    // independent boundary replay per language (driver-side sort)
    got.groupBy(_._2).foreach { case (lang, rowsL) =>
      val qs = rowsL.map(_._3).sorted
      val nL = qs.length.toLong
      def boundary(thr: Long): Long = qs((thr - 1).toInt)
      val t1 = boundary((nL + 2) / 3)
      val t2 = boundary((2 * nL + 2) / 3)
      rowsL.foreach { case (id, _, q, b) =>
        val exp = if (q <= t1) "head" else if (q <= t2) "middle" else "tail"
        assert(b == exp, s"doc $id lang $lang q=$q: bucket $b != $exp (t1=$t1 t2=$t2)")
      }
    }
  }

  // ---- round-11 gate: the cluster profile's skew handling, proven live ----

  test("hot-key join under the cluster profile: values identical, AQE shatters the hot partition") {
    import spark.implicits._
    // ClusterProfileSpec proves the confs LAND; this proves they DO the
    // right thing to a hot shuffle partition and change NO values. One
    // host owns a third of the corpus: keyed bin-join partitioning (the
    // operator's own skew answer for many-host pileups) cannot help when
    // the hot key IS one host — that residual is exactly what the
    // profile's AQE skew-join split exists for on a real cluster.
    val binMs = 86400000L
    def side(n: Int, host: Long => Long) = (0 until n).map { i =>
      (host(i.toLong), i.toLong * 1000, i.toLong * 1000 + 900)
    }
    // hot host 0: 8k mostly-disjoint intervals in ONE bin; tail: 800
    // hosts x 10. Join output stays bounded (disjoint intervals match
    // ~1:1) while the hot (host, bin) group dominates shuffle bytes.
    val l = (side(8000, _ => 0L) ++ side(8000, i => 1 + i % 800)).toDF("host", "ls", "le")
    val r = (side(8000, _ => 0L) ++ side(8000, i => 1 + i % 800)).toDF("rhost", "rs", "re")
    val saved = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    // per-stage max shuffle-read records: the split EVIDENCE (the hot
    // partition's rows spread over several tasks instead of one)
    def maxTaskRecords[T](action: => T): (T, Long) = {
      val maxRec = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null && m.shuffleReadMetrics != null)
            maxRec.getAndAccumulate(m.shuffleReadMetrics.recordsRead, math.max): Unit
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val out = action
        org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
        (out, maxRec.get())
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    try {
      // the PROFILE session: same JVM SparkContext, cluster posture on top
      // (shuffle width floor 64, AQE skew join ON)
      val prof = GraftSession.cluster(
        org.apache.spark.sql.SparkSession.builder().master("local[8]"),
        totalExecutorCores = 8,
        checkpointDir = s"${System.getProperty("java.io.tmpdir")}/graft-skew-cp-" +
          s"${java.lang.ProcessHandle.current().pid()}")
      assert(prof.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      // fixture-scale thresholds: the hot (host, bin) group is ~250 KB —
      // a 100 TB hot partition scaled down; AQE's 256 MB default exists
      // for real clusters, the MECHANISM under test is scale-free
      prof.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      prof.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      prof.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
      prof.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def run(): (Seq[(Long, Long, Long)], Long, String) = {
        val df = graft.operators.Temporal.intervalOverlapJoin(
            l, r, "ls", "le", "rs", "re", binMs,
            leftKey = Some("host"), rightKey = Some("rhost"))
          .select(col("host"), col("ls"), col("rs"))
        val (rows, maxRec) = maxTaskRecords {
          df.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq.sorted
        }
        (rows, maxRec, df.queryExecution.executedPlan.toString)
      }
      prof.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val (valsOff, maxOff, _) = run()
      prof.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val (valsOn, maxOn, planOn) = run()
      // value identity: the profile's skew split changes NOTHING
      assert(valsOn == valsOff,
        s"skew split changed join values: ${valsOff.size} vs ${valsOn.size} rows")
      assert(valsOn.size >= 16000, s"fixture must produce real overlaps: ${valsOn.size}")
      // split evidence 1: the final adaptive plan marks the join skew=true
      assert(planOn.contains("skew=true"),
        s"AQE must mark the shattered join, plan:\n${planOn.take(1500)}")
      // split evidence 2: the hot partition's rows spread across tasks —
      // skew-off reads the whole hot group in one task, skew-on caps the
      // per-task read well below it
      assert(maxOff >= 8000L,
        s"skew-off baseline must show the single-task hot read, saw $maxOff")
      assert(maxOn * 2 <= maxOff,
        s"skew-on must at least halve the hottest task's read: $maxOn vs $maxOff")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // ---- round-10 gates: index staleness under a 2x appended corpus ----

  test("IVF index serving a 2x appended delta: recall holds, staleness counter and " +
      "retrain threshold fire, appends are retry-idempotent") {
    val emb = Tables.load(spark, dir, "embeddings")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-stress-ivf-stale-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    Similarity.buildIvfIndex(emb, path, "vec_id", "embedding")
    val s0 = Similarity.ivfIndexStaleness(spark, path).head()
    assert(s0.getLong(0) == StressData.Vecs && s0.getLong(1) == 0L && !s0.getBoolean(3),
      s"fresh index staleness: $s0")
    // two delta batches, 1x the build corpus each: d1 = tiny deterministic
    // perturbation of every base vector (cos ~ 1 to its original); d2 =
    // the same plus a constant shift on dim 0 — DISTRIBUTION DRIFT, the
    // case that ages a train-once codebook
    def perturbed(off: Long, shift: Double): org.apache.spark.sql.DataFrame =
      emb.select((col("vec_id") + off).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + (pmod(xxhash64(col("vec_id") + off, i), lit(1000)).cast("double") / 1000.0 - 0.5) * 0.02
            + when(i === 0, lit(shift)).otherwise(lit(0.0))).as("embedding"))
    Similarity.appendToIvfIndex(perturbed(1000000L, 0.0), path, "vec_id", "embedding", "d1")
    Similarity.appendToIvfIndex(perturbed(2000000L, 0.3), path, "vec_id", "embedding", "d2")
    val s1 = Similarity.ivfIndexStaleness(spark, path).head()
    assert(s1.getLong(1) == 2L * StressData.Vecs, s"appended counter: $s1")
    assert(math.abs(s1.getDouble(2) - 2.0 / 3.0) < 1e-9)
    assert(s1.getBoolean(3),
      s"appended fraction ${s1.getDouble(2)} must trip IvfRetrainFraction=${Similarity.IvfRetrainFraction}")
    // recall at fraction 0.67 — the evidence the 0.5 threshold leans on:
    // delta queries (both batches, drifted included) must find their base
    // original in the top-10 through the STALE codebook's lists
    val nlist = spark.read.parquet(s"${Similarity.ivfCurrent(spark, path)}/meta").select("nlist").head().getInt(0)
    val nprobe = math.max(8, nlist / 20)
    def recallOf(off: Long, shift: Double, np: Int = nprobe): Double = {
      val qs = perturbed(off, shift).filter(col("vec_id") < lit(off) + 200 &&
        col("vec_id") % 2 === 0)
      val got = Similarity.ivfTopKFromIndex(path, qs, "vec_id", "embedding",
          k = 10, nprobe = np)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      got.count { case (q, ns) => ns.contains(q - off) }.toDouble / math.max(1, got.size)
    }
    val r1 = recallOf(1000000L, 0.0)
    val r2 = recallOf(2000000L, 0.3)
    assert(r1 >= 0.8, f"appended-batch recall $r1%.2f below 0.8")
    assert(r2 >= 0.8, f"drifted-batch recall $r2%.2f below 0.8 — retrain threshold too loose")
    // retry idempotence: re-running d1 must change neither the counter
    // nor the served results
    Similarity.appendToIvfIndex(perturbed(1000000L, 0.0), path, "vec_id", "embedding", "d1")
    val s2 = Similarity.ivfIndexStaleness(spark, path).head()
    assert(s2.getLong(1) == 2L * StressData.Vecs, s"retried append must count once: $s2")
    assert(math.abs(recallOf(1000000L, 0.0) - r1) < 1e-9,
      "retried append must not change served results")
    // ---- round-11: rebuild closes the staleness loop ----
    Similarity.rebuildIvfIndex(spark, path)
    val s3 = Similarity.ivfIndexStaleness(spark, path).head()
    assert(s3.getLong(0) == 3L * StressData.Vecs,
      s"rebuild must absorb appended mass into built_rows: $s3")
    assert(s3.getLong(1) == 0L && !s3.getBoolean(3),
      s"rebuild must reset the staleness counter: $s3")
    // auto-nlist re-derives from the 3x mass — per-list occupancy stays
    // level instead of lists growing 3x
    val nlist2 = spark.read.parquet(s"${Similarity.ivfCurrent(spark, path)}/meta").select("nlist").head().getInt(0)
    assert(nlist2 >= nlist, s"auto-nlist must not shrink on a 3x corpus: $nlist -> $nlist2")
    val nprobe2 = math.max(8, nlist2 / 20)
    // recall through the RETRAINED codebook: the drifted batch is now in
    // the training mass, so its recall must be at fresh-build level — at
    // least what the stale codebook served, and above the 0.8 floor
    val r1Post = recallOf(1000000L, 0.0, nprobe2)
    val r2Post = recallOf(2000000L, 0.3, nprobe2)
    assert(r1Post >= 0.8 && r1Post >= r1 - 0.02,
      f"post-rebuild recall $r1Post%.2f regressed vs stale-codebook $r1%.2f")
    assert(r2Post >= 0.8 && r2Post >= r2 - 0.02,
      f"post-rebuild drifted recall $r2Post%.2f regressed vs stale-codebook $r2%.2f")
    // a late upstream retry of an ABSORBED batch must be skipped (the
    // carried tombstone), not re-append vectors the rebuild already owns
    Similarity.appendToIvfIndex(perturbed(1000000L, 0.0), path, "vec_id", "embedding", "d1")
    val s4 = Similarity.ivfIndexStaleness(spark, path).head()
    assert(s4.getLong(1) == 0L,
      s"retry of an absorbed batch must be a no-op after rebuild: $s4")
    assert(math.abs(recallOf(1000000L, 0.0, nprobe2) - r1Post) < 1e-9,
      "retry of an absorbed batch must not change served results")
    // ---- round-12 (VERDICT r11 item 7): the drift-RECOVERY leg — the
    // rebuilt index must serve the drifted query set exactly like a
    // FRESH build over the combined corpus. Training is deterministic
    // per corpus and the rebuild recovers the identical corpus from its
    // own lists, so "within ε of a fresh build" is an equality here; the
    // assertion uses served-set equality per query, the strongest form.
    // This gives the 0.5 retrain threshold measured teeth: the fresh
    // build is BY DEFINITION the best a retrain can do, and the rebuild
    // is proven to reach it, not merely to beat the stale index.
    val freshPath = s"$path-fresh"
    val ffs = new org.apache.hadoop.fs.Path(freshPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (ffs.exists(new org.apache.hadoop.fs.Path(freshPath)))
      ffs.delete(new org.apache.hadoop.fs.Path(freshPath), true)
    Similarity.buildIvfIndex(
      emb.select(col("vec_id"), col("embedding"))
        .unionByName(perturbed(1000000L, 0.0))
        .unionByName(perturbed(2000000L, 0.3)),
      freshPath, "vec_id", "embedding")
    def servedSet(p: String, off: Long, shift: Double): Set[(Long, Long)] = {
      val qs = perturbed(off, shift).filter(col("vec_id") < lit(off) + 200 &&
        col("vec_id") % 2 === 0)
      Similarity.ivfTopKFromIndex(p, qs, "vec_id", "embedding", k = 10, nprobe = nprobe2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    Seq((1000000L, 0.0), (2000000L, 0.3)).foreach { case (off, shift) =>
      val rebuiltServe = servedSet(path, off, shift)
      val freshServe = servedSet(freshPath, off, shift)
      assert(rebuiltServe == freshServe,
        s"off=$off: rebuilt index must serve the drifted queries exactly like " +
          s"a fresh build on the combined corpus (rebuilt-only " +
          s"${(rebuiltServe -- freshServe).take(3)}, fresh-only " +
          s"${(freshServe -- rebuiltServe).take(3)})")
    }
    ffs.delete(new org.apache.hadoop.fs.Path(freshPath), true): Unit
  }

  test("minhash index serve+merge over two 1x deltas equals the inline run pair-for-pair; " +
      "skipping the merge provably drops cross-delta pairs") {
    // a 120-doc slice of the hot near-identical block (dup pairs in every
    // %3 class and across them) plus a realistic tail — the full 1200-doc
    // hot block would be a ~720k-pair collect for no extra coverage
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 120 ||
        (col("doc_id") >= StressData.HotBlock && col("doc_id") < 4000))
    val base = docs.filter(col("doc_id") % 3 === 0)
    val d1 = docs.filter(col("doc_id") % 3 === 1)
    val d2 = docs.filter(col("doc_id") % 3 === 2)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("doc_a"), col("doc_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairSet(Dedup.minhashLsh(docs, "doc_id", "text"))
    val table = s"stale_mh_${java.lang.ProcessHandle.current().pid()}"
    Dedup.minhashIndexWrite(base, "doc_id", "text", table)
    val st0 = Dedup.minhashIndexStaleness(spark, table).head()
    assert(st0.getLong(1) == 0L && !st0.getBoolean(3))
    // the documented daily-batch recipe: within-delta pairs + serve vs
    // index, then MERGE before the next batch
    val day1 = pairSet(Dedup.minhashLshAgainstIndex(d1, "doc_id", "text", table)) ++
      pairSet(Dedup.minhashLsh(d1, "doc_id", "text"))
    Dedup.minhashIndexAppend(d1, "doc_id", "text", table, "b1")
    val day2 = pairSet(Dedup.minhashLshAgainstIndex(d2, "doc_id", "text", table)) ++
      pairSet(Dedup.minhashLsh(d2, "doc_id", "text"))
    Dedup.minhashIndexAppend(d2, "doc_id", "text", table, "b2")
    val buildPairs = pairSet(Dedup.minhashLsh(base, "doc_id", "text"))
    val workflow = (buildPairs ++ day1 ++ day2)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    assert(workflow == truth,
      s"serve+merge must equal inline: missing ${(truth -- workflow).take(5)}, " +
        s"extra ${(workflow -- truth).take(5)}")
    // negative control: WITHOUT the b1 merge, day2's serve cannot see d1,
    // so the truth's cross-delta pairs are structurally missing — this is
    // the staleness the counter exists to surface
    val cross = truth.filter { case (a, b) =>
      (a % 3 == 1 && b % 3 == 2) || (a % 3 == 2 && b % 3 == 1)
    }
    assert(cross.nonEmpty, "fixture must contain cross-delta true pairs")
    // day2 ran AFTER the merge and does find them; the no-merge serve is
    // the same candidate join against the b1-less table — replay it
    val table2 = s"stale_mh2_${java.lang.ProcessHandle.current().pid()}"
    Dedup.minhashIndexWrite(base, "doc_id", "text", table2)
    val day2NoMerge = pairSet(Dedup.minhashLshAgainstIndex(d2, "doc_id", "text", table2)) ++
      pairSet(Dedup.minhashLsh(d2, "doc_id", "text"))
    val missed = cross -- day2NoMerge.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    assert(missed.nonEmpty,
      "an unmerged index must measurably miss cross-delta pairs (else the gate tests nothing)")
    // counter + rebuild recommendation at appended fraction 2/3
    val st1 = Dedup.minhashIndexStaleness(spark, table).head()
    assert(st1.getLong(1) > 0 && st1.getBoolean(3),
      s"2x appended index must recommend rebuild: $st1")
    // exactly-once per batchId: a re-run of b1 is a no-op
    Dedup.minhashIndexAppend(d1, "doc_id", "text", table, "b1")
    val st2 = Dedup.minhashIndexStaleness(spark, table).head()
    assert(st2.getLong(1) == st1.getLong(1), "retried merge must count once")
    // ---- round-11: rebuild defragments, resets counters, changes no pairs ----
    def tableFiles(t: String): Int = {
      val loc = new org.apache.hadoop.fs.Path(spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t)).location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(loc).count(f => f.isFile && f.getPath.getName.startsWith("part-"))
    }
    val (shBefore, bkBefore) = Dedup.minhashLiveTables(spark, table)
    val bucketSpec = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(shBefore))
      .bucketSpec.get.numBuckets
    val filesBefore = tableFiles(bkBefore)
    assert(filesBefore > bucketSpec,
      s"fixture must be fragmented before rebuild (build + 2 appends), saw $filesBefore files")
    // an exact-duplicate delta with fresh disjoint ids: its served pair
    // set is the semantic probe the rebuild must preserve bit-for-bit
    val probe = docs.filter(col("doc_id") < 120)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val servedBefore = pairSet(Dedup.minhashLshAgainstIndex(probe, "doc_id", "text", table))
    assert(servedBefore.nonEmpty, "probe delta must hit the index")
    Dedup.minhashIndexRebuild(spark, table)
    // defragmented: one file per bucket in both tables (of the NEW live
    // generation — the rebuild publishes fresh tables, never moves old ones)
    val (shAfter, bkAfter) = Dedup.minhashLiveTables(spark, table)
    assert(shAfter != shBefore, "rebuild must publish a new generation")
    assert(tableFiles(shAfter) <= bucketSpec &&
      tableFiles(bkAfter) <= bucketSpec,
      s"rebuild must leave at most one file per bucket, saw " +
        s"${tableFiles(shAfter)} / ${tableFiles(bkAfter)}")
    // counters reset: full mass indexed, nothing appended, no recommendation
    val st3 = Dedup.minhashIndexStaleness(spark, table).head()
    assert(st3.getLong(0) == st1.getLong(0) + st1.getLong(1) &&
      st3.getLong(1) == 0L && !st3.getBoolean(3),
      s"rebuild must absorb appends into indexedRows and reset the counter: $st3")
    // banding is untrained: the served pair set is IDENTICAL post-rebuild
    val servedAfter = pairSet(Dedup.minhashLshAgainstIndex(probe, "doc_id", "text", table))
    assert(servedAfter == servedBefore,
      s"rebuild changed served pairs: missing ${(servedBefore -- servedAfter).take(5)}, " +
        s"extra ${(servedAfter -- servedBefore).take(5)}")
    // absorbed-batch retry protection: appendedBatches carried forward
    Dedup.minhashIndexAppend(d1, "doc_id", "text", table, "b1")
    val st4 = Dedup.minhashIndexStaleness(spark, table).head()
    assert(st4.getLong(1) == 0L,
      s"retry of an absorbed batch must be a no-op after rebuild: $st4")
  }

  test("hammingPairs viral duplicate block: the quadratic expansion is salted " +
      "across tasks, pair set exact") {
    import graft.operators.Media
    import spark.implicits._
    // 3000 identical payloads (one viral image re-posted) + a 2000-doc
    // distinct tail: the old per-bucket pairCombos generated the group's
    // 4,498,500 pairs inside ONE task; the salted expansion spreads them
    // over (sig, si, sj) cells. The fixture corpus has NO non-identical
    // pair within Hamming ≤ 3 (probed at every SF), so the exact answer
    // is V(V-1)/2 intra pairs and nothing else.
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val viralText = d.filter(col("doc_id") === 0).select(col("text")).head().getString(0)
    // 6000 copies: the deterministic 2% probe estimates the group well
    // past hammingSaltMinGroup (4096), so the PRODUCTION dispatch — not
    // a test knob — routes this corpus to the salted path
    val v = 6000
    val viral = spark.range(v).select((col("id") + 1000000L).as("doc_id"),
      lit(viralText).as("text"))
    val corpus = d.filter(col("doc_id") >= 1 && col("doc_id") < 2000)
      .unionByName(viral)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media", Media.asMedia("payload", "image/stub"))
    // the repartition stage carries one small sliced row per salt cell —
    // lower the record floor so the balance audit sees it spread
    val n = assertBalanced("viralHamming", factor = 8.0, minRecords = 100L) {
      Media.perceptualDupPairs(corpus, "doc_id", "media", maxDist = 3).count()
    }
    val expected = v.toLong * (v - 1) / 2
    assert(n == expected, s"viral block must yield exactly $expected pairs, got $n")
    // path identity: on the planted-duplicate q127 corpus (small groups —
    // the direct path's home turf) the salted path, forced via the knob,
    // must produce the identical pair multiset
    val small = d.union(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media", Media.asMedia("payload", "image/stub"))
    def pairSet(): Set[(Long, Long, Int)] =
      Media.perceptualDupPairs(small, "doc_id", "media", maxDist = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = pairSet()
    val savedMin = graft.operators.Dedup.hammingSaltMinGroup
    val salted = try {
      graft.operators.Dedup.hammingSaltMinGroup = 0L
      pairSet()
    } finally graft.operators.Dedup.hammingSaltMinGroup = savedMin
    assert(salted == direct,
      s"salted path must equal direct: missing ${(direct -- salted).take(5)}, " +
        s"extra ${(salted -- direct).take(5)}")
    assert(direct.nonEmpty)
  }

  test("hammingPairs TWO mutually-near viral groups: the inter-group |A|x|B| " +
      "expansion is salted across tasks, pair set exact") {
    import graft.operators.Media
    import spark.implicits._
    // the round-13 salted path spread one viral group's INTRA pairs over
    // S(S+1)/2 cells but expanded inter-group pairs with two plain joins —
    // two mutually-near viral groups (the same meme re-encoded twice, each
    // re-posted thousands of times) piled |A|x|B| rows into one join task.
    // Fixture: group A = 6000 copies of a doc, group B = 6000 copies of a
    // one-char edit whose stub phash lands within Hamming 1..3 of A's (a
    // local edit perturbs only the stride samples it touches).
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val textA = d.filter(col("doc_id") === 0).select(col("text")).head().getString(0)
    val hashA = Media.StubCodec.phash64(textA.getBytes("UTF-8"))
    val textB = (0 until textA.length).iterator.map { p =>
      textA.updated(p, if (textA(p) == 'a') 'b' else 'a')
    }.find { t =>
      val dist = java.lang.Long.bitCount(
        Media.StubCodec.phash64(t.getBytes("UTF-8")) ^ hashA)
      dist >= 1 && dist <= 3
    }.getOrElse(fail("fixture: no one-char edit lands within Hamming 1..3"))
    val v = 6000
    def copies(t: String, base: Long) = spark.range(v)
      .select((col("id") + base).as("doc_id"), lit(t).as("text"))
    val corpus = copies(textA, 1000000L).unionByName(copies(textB, 2000000L))
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media", Media.asMedia("payload", "image/stub"))
    val n = assertBalanced("viralInterHamming", factor = 8.0, minRecords = 100L) {
      Media.perceptualDupPairs(corpus, "doc_id", "media", maxDist = 3).count()
    }
    // exactly: each group's v(v-1)/2 intra pairs plus the v*v inter pairs
    val expected = v.toLong * (v - 1) + v.toLong * v
    assert(n == expected,
      s"two mutually-near viral groups must yield exactly $expected pairs, got $n")
    // forced-path identity: with BOTH salt knobs at 0 every signature pair
    // takes the sliced inter expansion — on the small planted-dup corpus
    // (singleton signatures included) the pair set must be identical
    val small = d.union(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media", Media.asMedia("payload", "image/stub"))
    def pairSet(): Set[(Long, Long, Int)] =
      Media.perceptualDupPairs(small, "doc_id", "media", maxDist = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = pairSet()
    val savedMin = graft.operators.Dedup.hammingSaltMinGroup
    val savedSide = graft.operators.Dedup.hammingSaltInterMinSide
    val forced = try {
      graft.operators.Dedup.hammingSaltMinGroup = 0L
      graft.operators.Dedup.hammingSaltInterMinSide = 0L
      pairSet()
    } finally {
      graft.operators.Dedup.hammingSaltMinGroup = savedMin
      graft.operators.Dedup.hammingSaltInterMinSide = savedSide
    }
    assert(forced == direct,
      s"sliced inter path must equal direct: missing ${(direct -- forced).take(5)}, " +
        s"extra ${(forced -- direct).take(5)}")
    assert(direct.nonEmpty)
  }

  test("cluster-registry hot-template epoch past the edge ceiling: dispatches " +
      "distributed (used to throw), balanced, equal to batch connected components") {
    import graft.operators.ClusterRegistry
    import spark.implicits._
    // 20k seeded 3-doc clusters (60k member docs), then ONE batch doc
    // near-dup to every one of them — 60k edges in a single epoch, the
    // 100TB hot-template shape that used to crash on MaxEpochEdges
    val regPath =
      s"${System.getProperty("java.io.tmpdir")}/graft-stress-reg-${java.lang.ProcessHandle.current().pid()}"
    val nClusters = 20000
    val seedPairs = spark.range(nClusters).select(
        (col("id") * 3).as("doc_a"), (col("id") * 3 + 1).as("doc_b"))
      .unionByName(spark.range(nClusters).select(
        (col("id") * 3).as("doc_a"), (col("id") * 3 + 2).as("doc_b")))
    ClusterRegistry.seed(spark, seedPairs, regPath)
    val hot = 1000000L
    val hotEdges = spark.range(nClusters.toLong * 3)
      .select(lit(hot).as("doc_a"), col("id").as("doc_b"))
    val saved = ClusterRegistry.MaxEpochEdges
    try {
      ClusterRegistry.MaxEpochEdges = 1000
      assertBalanced("registryHotEpoch", factor = 8.0) {
        ClusterRegistry.registerEpoch(spark, regPath,
          Seq(hot).toDF("doc_id"), hotEdges, "hot")
      }
    } finally ClusterRegistry.MaxEpochEdges = saved
    // independent formulation: batch CC over seed ∪ hot edges — everything
    // is one component under rep 0
    val probeIds = Seq(hot, 0L, 1L, 2L, 29999L, 59999L, 3L * (nClusters - 1))
    val got = ClusterRegistry.assignFor(probeIds.toDF("doc_id"), regPath)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == probeIds.map(_ -> 0L).toMap,
      s"hot epoch must merge every seeded cluster into rep 0: $got")
    // the relabel log carries exactly one row per losing representative
    // (nClusters - 1: every seed rep except 0), never a member rewrite
    val g = graft.core.GenDir.resolveRequired(spark, regPath)
    val relabels = spark.read.parquet(s"$g/relabel").count()
    assert(relabels == (nClusters - 1).toLong,
      s"one relabel row per losing rep expected, saw $relabels")
  }

  test("BM25 index serve on the hostile corpus: balanced under hot-block " +
      "term skew, partition-pruned, exact vs the fresh scorer") {
    import graft.operators.{Pipeline, RetrievalIndex}
    val docs = Tables.load(spark, dir, "documents")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-stress-bm25-spec-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    // the StressBench bm25 fixture: the full corpus indexed (hot-block
    // terms are corpus-hot — 1200 near-identical docs share vocabulary —
    // absorbed at build by the map-side (doc, term) combine), a ~100-doc
    // query batch served; one query from INSIDE the hot block makes its
    // hot terms ride the serve join
    RetrievalIndex.build(docs, "doc_id", "text", path)
    val qs = docs.filter(col("doc_id") % 500 === 7)
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val got = assertBalanced("bm25Serve", factor = 8.0) {
      norm(RetrievalIndex.topK(qs, "doc_id", "text", path, k = 10))
    }
    assert(got.nonEmpty && got.exists(_._1 == 7L),
      "the hot-block query (doc 7) must return rankings")
    // exactness at stress scale: the fresh one-shot scorer over the same
    // corpus is the reference (its own oracle equivalence is q113's gate)
    assert(got == norm(Pipeline.bm25TopK(qs, docs, "doc_id", "text",
      "doc_id", "text", k = 10)), "serve-from-index drifted from fresh at 10x")
    // the pruning contract survives the stress layout: the serve's pb
    // filter lands as a partition filter, so only the query terms'
    // partitions are read
    val plan = RetrievalIndex.prunedFor(
        docs.filter(col("doc_id") === 7), "doc_id", "text", path)._2
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*pb[^\\]]*(INSET|IN|=) ".r.findFirstIn(plan).isDefined,
      s"expected a pb partition filter in:\n$plan")
    RetrievalIndex.drop(spark, path)
  }

  test("benchmark-decon serve on the hostile corpus: balanced under the " +
      "hot-shingle fan-out, exact against a driver-side string replay, min-gen versioned") {
    import graft.operators.DeconIndex
    val docs = Tables.load(spark, dir, "documents")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-stress-decon-spec-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    // seed() self-resets the path, so no pre-drop is needed
    // the StressBench decon_serve fixture: a 2 % benchmark slice — ~24 of
    // its docs sit INSIDE the near-identical hot block, so the block's
    // shared shingles are corpus-hot keys through the probe join
    DeconIndex.seed(spark, path, docs.filter(col("doc_id") % 50 === 0), "text", 6)
    val got = assertBalanced("deconServe", factor = 8.0) {
      DeconIndex.serve(spark, path, docs, "doc_id", "text", 6)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    }
    assert(got.valuesIterator.forall(_ == 1), "single release: every hit is gen 1")
    // the hot block must read as (nearly) fully contaminated — the
    // benchmark members inside it share their shingles with the block
    val hotHits = got.keysIterator.count(_ < StressData.HotBlock)
    assert(hotHits > StressData.HotBlock * 0.9,
      s"hot-block contamination $hotHits of ${StressData.HotBlock} — the " +
        "hot-shingle fan-out path was not exercised")
    // exactness: driver-side STRING 6-gram replay (the DuckDB-oracle
    // formulation, independent of the engine's hash kernel) over the hot
    // block plus a modulo sample of the tail
    val benchTexts = docs.filter(col("doc_id") % 50 === 0)
      .select(col("text")).collect().map(_.getString(0))
    def grams(t: String): Set[String] = {
      val w = t.trim.split("\\s+").toIndexedSeq
      if (w.length >= 6) w.sliding(6).map(_.mkString(" ")).toSet
      else Set(w.mkString(" "))
    }
    val benchGrams = benchTexts.iterator.flatMap(grams).toSet
    val sample = docs.filter(col("doc_id") < StressData.HotBlock ||
        col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text")).collect()
    sample.foreach { r =>
      val expectHit = grams(r.getString(1)).exists(benchGrams.contains)
      assert(got.contains(r.getLong(0)) == expectHit,
        s"doc ${r.getLong(0)}: engine ${got.contains(r.getLong(0))} vs replay $expectHit")
    }
    // versioned path at scale: a second release over a disjoint slice —
    // gen-1 hits keep their gen (min-gen), new hits carry gen 2
    DeconIndex.publish(spark, path,
      docs.filter(col("doc_id") % 50 === 7), "text", 6, benchGen = 2)
    val got2 = DeconIndex.serve(spark, path, docs, "doc_id", "text", 6)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    got.foreach { case (d, g) =>
      assert(got2.get(d).contains(g), s"doc $d: release-1 hit moved to ${got2.get(d)}")
    }
    assert(got2.size > got.size, "release 2 must contaminate new docs")
    DeconIndex.drop(spark, path)
  }

  test("fragmented-registry election read: assignWithReps over ~100 epoch " +
      "batch dirs (sidecar folded + re-fragmented) is job-bounded and exact") {
    import graft.operators.ClusterRegistry
    import graft.tools.StressBench
    import spark.implicits._
    // the StressBench registry_assign fixture: 100 chained quality-aware
    // epochs, one compact mid-way — the daily-epoch-cadence registry state
    val reg = StressBench.fragmentedRegistry(spark)
    val n = StressBench.RegistryEpochs.toLong * StressBench.RegistryPer
    val ids = spark.range(n).select(col("id").as("doc_id"))
    // the scale property a fragmented registry read must hold: ~100 batch
    // dirs are ONE parquet source each for the member/elect reads — the
    // job count is a small constant, never per-dir (a per-batch loop
    // would read as dirs × jobs and collapse at daily-epoch cadence).
    // Shuffle balance is vacuously clean here (the member/elect sides
    // broadcast at this size; the hot-epoch test above audits the
    // registry's distributed-CC shuffles), so the audit is the job bound
    // plus exactness.
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val jl = new SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(jl)
    val got =
      try ClusterRegistry.assignWithReps(ids, reg)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      finally {
        org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
        spark.sparkContext.removeSparkListener(jl)
      }
    assert(jobs.get() <= 12,
      s"the election read must stay a constant handful of jobs over ~100 " +
        s"batch dirs, ran ${jobs.get()}")
    assert(got.length == n)
    // chains by residue: cluster id = the residue (epoch-0 doc), elected
    // rep = the max-quality chain member (quality = doc % 97, ties to the
    // smaller id) — exact against the direct formulation
    val per = StressBench.RegistryPer
    def expectRep(r: Long): Long =
      (r until n by per.toLong).minBy(d => (-(d % 97), d))
    val reps = (0L until per.toLong).map(r => r -> expectRep(r)).toMap
    got.foreach { case (doc, cid, rep) =>
      assert(cid == doc % per, s"doc $doc cluster $cid != ${doc % per}")
      assert(rep == reps(doc % per),
        s"doc $doc rep $rep != elected ${reps(doc % per)}")
    }
  }
}
