package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.{Pipeline, Temporal}

/** Semantics of the temporal-join and pipeline operators against naive
  * (quadratic) reference formulations at small scale — the operators
  * themselves never build the quadratic plan. */
class TemporalPipelineSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  test("asofJoin == theta-join + max aggregate reference") {
    val ev = Tables.load(spark, dir, "events")
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    val clicksR = clicks.select(col("user_id").as("cu"), col("ts").as("cts"))
    val got = Temporal.asofJoin(purch, clicks, "user_id", "ts", "ts", "m")
      .select(col("event_id"), unix_micros(col("m")).as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val ref = purch.join(clicksR,
        col("user_id") === col("cu") && col("cts") <= col("ts"), "left")
      .groupBy(col("event_id")).agg(max(unix_micros(col("cts"))).as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == ref)
    assert(got.valuesIterator.exists(_.isDefined) && got.valuesIterator.exists(_.isEmpty),
      "test data should exercise both matched and unmatched purchases")
  }

  test("rangeCountBinned == unbinned theta-join reference (incl. zero counts)") {
    val ev = Tables.load(spark, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    val clicksR = clicks.select(col("user_id").as("cu"), col("ts").as("cts"))
    val w = 10L * 60 * 1000
    val got = Temporal.rangeCountBinned(errors, clicks,
      "user_id", "event_id", "ts", "ts", w, "n")
      .select(col("event_id"), col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = errors.join(clicksR,
        col("user_id") === col("cu") &&
          unix_micros(col("cts")) >= unix_micros(col("ts")) - w * 1000 &&
          unix_micros(col("cts")) < unix_micros(col("ts")), "left")
      .groupBy(col("event_id")).agg(count(col("cu")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
    assert(got.valuesIterator.exists(_ == 0L) && got.valuesIterator.exists(_ > 0L),
      "test data should exercise both zero and positive window counts")
  }

  test("rangeJoinBinned == unbinned theta-join reference (pair-exact)") {
    val ev = Tables.load(spark, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
    val w = 10L * 60 * 1000
    val got = Temporal.rangeJoinBinned(errors, clicks, "user_id", "ts", "cts", w)
      .select(col("event_id"), unix_micros(col("cts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val clicksR = clicks.select(col("user_id").as("cu"), col("cts"))
    val ref = errors.join(clicksR,
        col("user_id") === col("cu") &&
          unix_micros(col("cts")) >= unix_micros(col("ts")) - w * 1000 &&
          unix_micros(col("cts")) < unix_micros(col("ts")))
      .select(col("event_id"), unix_micros(col("cts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == ref)
    assert(got.nonEmpty, "window pairs must exist in the test data")
  }

  test("intervalOverlapJoin == theta-join reference; endpoints, containment, multi-bin, one emission") {
    import spark.implicits._
    val bin = 100L
    // touching endpoints, containment, disjoint, bin-straddling, long
    // multi-bin spans — every overlap topology
    val left = Seq((1L, 0L, 100L), (2L, 250L, 260L), (3L, 0L, 950L),
      (4L, 500L, 505L), (5L, 99L, 101L))
      .toDF("lid", "ls", "le")
    val right = Seq((10L, 100L, 150L), (11L, 200L, 300L), (12L, 940L, 1000L),
      (13L, 600L, 700L), (14L, 0L, 1000L))
      .toDF("rid", "rs", "re")
    val got = graft.operators.Temporal.intervalOverlapJoin(
        left, right, "ls", "le", "rs", "re", bin)
      .select(col("lid"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val ref = left.crossJoin(right)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select(col("lid"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == ref, s"got $got vs ref $ref")
    assert(got.distinct == got, "no pair may emit twice")
    assert(got.contains((1L, 10L)), "touching endpoints must match")
    assert(got.contains((3L, 14L)), "containment must match")
    assert(!got.contains((2L, 13L)), "disjoint intervals must not match")
    // larger randomized cross-check on real data shapes
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), unix_millis(col("ts")).as("ms")).limit(300)
    val li = ev.select(col("event_id").as("aid"), col("ms").as("as_"),
      (col("ms") + 90000L).as("ae"))
    val ri = ev.select((col("event_id") + 1000000L).as("bid"),
      (col("ms") + 45000L).as("bs"), (col("ms") + 120000L).as("be"))
    val g2 = graft.operators.Temporal.intervalOverlapJoin(
        li, ri, "as_", "ae", "bs", "be", 60000L)
      .select(col("aid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val r2 = li.crossJoin(ri)
      .filter(col("as_") <= col("be") && col("bs") <= col("ae"))
      .select(col("aid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(g2 == r2 && g2.nonEmpty)
  }

  test("centroidMeans == driver-side fold of member vectors in id order") {
    import graft.operators.Similarity
    val emb = Tables.load(spark, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
    val assign = Similarity.assignToCentroids(emb, cents,
      "vec_id", "embedding", "vec_id", "embedding")
    val got = Similarity.centroidMeans(emb, assign, "vec_id", "embedding", "centroid_id")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val members = assign.select(col("vec_id"), col("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = emb.select(col("vec_id"),
      graft.functions.vec_double(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val byCluster = members.toSeq.groupBy(_._2).view
      .mapValues(_.map(_._1).sorted).toMap
    byCluster.foreach { case (cid, ids) =>
      val dim = vecs(ids.head).size
      (0 until dim).foreach { d =>
        var s = 0.0
        ids.foreach(i => s += vecs(i)(d)) // same fold order: sorted member id
        val want = s / ids.size
        assert(got((cid, d + 1)) == want,
          s"cluster $cid dim ${d + 1}: ${got((cid, d + 1))} != $want")
      }
    }
    assert(got.size == byCluster.size * vecs(0L).size)
  }

  test("asofJoin edges: empty right side, exact-equal timestamps, dup right ts") {
    import spark.implicits._
    import graft.operators.Temporal
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val left = Seq((1L, ts(100), 10L), (2L, ts(50), 20L))
      .toDF("k", "ts", "pay")
    // empty right → all matches null
    val empty = Seq.empty[(Long, java.sql.Timestamp)].toDF("k", "ts")
    val gotEmpty = Temporal.asofJoin(left, empty, "k", "ts", "ts", "m")
    assert(gotEmpty.count() == 2 && gotEmpty.filter(col("m").isNotNull).count() == 0)
    // right at EXACTLY the left ts matches (<= semantics); duplicates at the
    // boundary are indistinguishable (matched value is the ts itself)
    val right = Seq((1L, ts(100)), (1L, ts(100)), (1L, ts(101)), (2L, ts(51)))
      .toDF("k", "ts")
    val got = Temporal.asofJoin(left, right, "k", "ts", "ts", "m")
      .select(col("k"), unix_micros(col("m")).as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(1L).contains(100000000L), s"boundary ts must match: $got")
    assert(got(2L).isEmpty, s"future-only right rows must not match: $got")
  }

  test("batch sessionization (gap islands) == streaming Sessionize state machine") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Events
    import graft.streaming.Sessionize
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
    val gapMs = 10L * 60 * 1000
    val batch = Events.sessionCounts(ev, "user_id", "ts", "event_id", gapMs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val rows = ev.select(col("user_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    val input = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val q = Sessionize.sessions(input.toDF().toDF("user_id", "ts"), gapMs = gapMs).toDF()
      .writeStream.outputMode("append").format("memory").queryName("sess_eq").start()
    input.addData(rows.toSeq)
    q.processAllAvailable()
    // watermark flush so every open session times out and emits
    val maxTs = rows.map(_._2.getTime).max
    input.addData((Long.MaxValue, new java.sql.Timestamp(maxTs + 24L * 3600 * 1000)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_eq")
      .filter(col("userId") =!= Long.MaxValue)
      .groupBy(col("userId")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch,
      s"diff=${(batch.toSet diff streamed.toSet) ++ (streamed.toSet diff batch.toSet)}")
  }

  test("hash sampling is content-determined: duplicate texts sample identically") {
    val docs = Tables.load(spark, dir, "documents")
    val flagged = docs.select(md5(col("text")).as("h"),
      Pipeline.hashSampled(docs, "text", "34").as("keep"))
    val inconsistent = flagged.groupBy(col("h"))
      .agg(countDistinct(col("keep")).as("k"))
      .filter(col("k") > 1).count()
    assert(inconsistent == 0, "same content must sample the same way")
  }

  test("bloom-prefiltered decontaminate == plain decontaminate (exactness preserved)") {
    val docs = Tables.load(spark, dir, "documents")
    // eval slice ⊂ corpus so positives exist at every SF
    val test = docs.filter(col("doc_id") % 10 === 0)
    val plain = Pipeline.decontaminate(docs, test, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloomed = Pipeline.decontaminateBloom(docs, test, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloomed == plain)
    assert(plain.size < docs.count(), "eval-slice contamination must be removed")
  }

  test("count-min sketch heavy hitters: estimates over-count within eps bound") {
    val docs = Tables.load(spark, dir, "documents")
    val toks = docs.select(explode(graft.functions.tokens(lower(col("text")))).as("tok"))
    val truth = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val total = toks.count()
    val eps = 0.001
    val cms = toks.stat.countMinSketch(col("tok"), eps, 0.99, seed = 42)
    truth.foreach { case (tok, n) =>
      val est = cms.estimateCount(tok)
      assert(est >= n, s"CMS may never under-count: $tok est=$est true=$n")
      assert(est <= n + (eps * total).toLong + 1,
        s"CMS over-count beyond eps bound: $tok est=$est true=$n total=$total")
    }
  }

  test("repetitionSignals == explode/groupBy reference formulation") {
    val docs = Tables.load(spark, dir, "documents")
    val got = Pipeline.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // reference: explode bigrams, count per (doc, bigram), max/sum
    val toks = docs.select(col("doc_id"), graft.functions.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
    val bg = toks.select(col("doc_id"),
      explode(zip_with(slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("b"))
    val top = bg.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg((max(col("n")).cast("double") / sum(col("n")).cast("double")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dtr = toks.select(col("doc_id"),
      (size(array_distinct(col("tk"))).cast("double") / size(col("tk")).cast("double")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == top.keySet)
    got.foreach { case (id, (f, r)) =>
      assert(f == top(id), s"top_bigram_frac mismatch doc $id")
      assert(r == dtr(id), s"distinct_token_ratio mismatch doc $id")
    }
  }

  test("qualityFilter keeps exactly the rows satisfying its thresholds") {
    val docs = Tables.load(spark, dir, "documents")
    val kept = Pipeline.qualityFilter(docs, "doc_id", "text", 20, 120, 0.45)
    assert(kept.filter(!col("n_tokens").between(20, 120) ||
      col("distinct_ratio") < 0.45).count() == 0)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val refIds = docs.select(col("doc_id"),
        graft.functions.tokens(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).as("n"),
        (size(array_distinct(col("tk"))).cast("double") / size(col("tk")).cast("double")).as("r"))
      .filter(col("n").between(20, 120) && col("r") >= 0.45)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds == refIds)
    assert(keptIds.nonEmpty && keptIds.size < docs.count(),
      "thresholds should be exercised in both directions")
  }

  test("decontaminateNgrams == string-shingle overlap reference") {
    val docs = Tables.load(spark, dir, "documents")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val testSet = docs.filter(col("doc_id") % 10 === 0)
    val got = Pipeline.decontaminateNgrams(train, testSet, "doc_id", "text", 6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // reference over shingle STRINGS (no hashing)
    val evalG = testSet.select(explode(graft.functions.shingles(col("text"), 6)).as("g")).distinct()
    val bad = train.select(col("doc_id"),
        explode(graft.functions.shingles(col("text"), 6)).as("g"))
      .join(evalG, Seq("g"), "left_semi").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val ref = train.select("doc_id").collect().map(_.getLong(0)).toSet diff bad
    assert(got == ref)
    assert(bad.nonEmpty, "near-duplicate contamination must exist in the data")
  }

  test("heavyHitters == exact groupBy HAVING (CMS prefilter is invisible)") {
    val docs = Tables.load(spark, dir, "documents")
    val got = Pipeline.heavyHitters(docs, "text", denom = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = docs.select(explode(graft.functions.tokens(lower(col("text")))).as("tok"))
    val total = toks.count()
    val ref = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .filter(col("n") * 100 >= total)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == ref)
    assert(got.nonEmpty && got.size < total, "threshold should actually select")
  }

  test("weightedPrioritySample: deterministic, k rows, weight-sensitive") {
    val docs = Tables.load(spark, dir, "documents")
    val s1 = Pipeline.weightedPrioritySample(docs, "doc_id", "text", "n_chars", 25)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val s2 = Pipeline.weightedPrioritySample(docs.repartition(13), "doc_id", "text", "n_chars", 25)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "sample must be independent of partitioning")
    assert(s1.size == 25)
    // priorities of selected rows are the global k smallest
    val all = docs.withColumn("p",
      expr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT) DIV n_chars"))
      .select(col("doc_id"), col("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(r => (r._2, r._1)).take(25).map(_._1).toSeq
    assert(s1 == all)
  }

  test("packSequences: bins start at exclusive-cumsum DIV budget, counts preserved") {
    val docs = Tables.load(spark, dir, "documents")
    val packed = Pipeline.packSequences(docs, "doc_id", "text", "source", 256)
    // every doc appears exactly once
    assert(packed.count() == docs.count())
    // bin ids are non-decreasing in doc order within a group and the token
    // sum across bins equals the group token sum
    val perGroup = packed.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("nt"), countDistinct(col("bin")).as("nb"))
    val ref = docs.groupBy(col("source"))
      .agg(sum(graft.functions.token_count(col("text"))).as("nt"))
    val joined = perGroup.join(ref.withColumnRenamed("nt", "ref_nt"), "source")
    assert(joined.filter(col("nt") =!= col("ref_nt")).count() == 0)
    // a bin's docs hold >= budget tokens only if it closes (i.e. next doc
    // spills to a later bin) — structural check on one group
    val rows = packed.filter(col("source") === "src0")
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(1), r.getInt(2).toLong, r.getLong(3)))
    var cum = 0L
    rows.foreach { case (_, nt, bin) =>
      assert(bin == cum / 256, s"bin must equal exclusive-cumsum DIV budget")
      cum += nt
    }
  }

  test("approx quantiles land within the accuracy rank-error band of exact") {
    val docs = Tables.load(spark, dir, "documents")
    val acc = 1000
    val joined = docs.groupBy(col("lang"))
      .agg(
        percentile_approx(col("n_chars"), lit(0.5), lit(acc)).as("approx"),
        expr("percentile(n_chars, 0.5)").as("exact"),
        count(lit(1)).as("n"),
        min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
      .collect()
    joined.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getDouble(2))
      val (n, lo, hi) = (r.getLong(3), r.getLong(4), r.getLong(5))
      // rank error <= n/acc elements; with n << acc the estimate must be
      // an actual element adjacent to the true median
      assert(approx >= lo && approx <= hi)
      assert(math.abs(approx - exact) <= (hi - lo).toDouble * (n.toDouble / acc + 0.02) +
        math.ulp(exact) + 1.0,
        s"approx $approx too far from exact $exact (lang=${r.getString(0)}, n=$n)")
    }
  }

  test("round-3 text ops survive hostile inputs (empty, single-token, whitespace runs)") {
    import spark.implicits._
    val hostile = Seq(
      "", " ", "a", "a b", "a  b", "dup dup dup dup", "trailing space ",
      "\tleading tab", "x y x y x y", "one two three four five six seven")
      .zipWithIndex.map { case (t, i) => (i.toLong, t, "s" + (i % 2)) }
      .toDF("doc_id", "text", "source")
    // repetitionSignals: docs with <2 tokens drop; ratios stay in (0, 1]
    val rep = Pipeline.repetitionSignals(hostile, "doc_id", "text").collect()
    assert(rep.forall(r => r.getDouble(1) > 0 && r.getDouble(1) <= 1.0))
    assert(rep.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1.0))
    assert(!rep.map(_.getLong(0)).contains(0L), "empty doc must drop")
    // all-same-bigram doc: top fraction exactly 1.0
    val dup = rep.find(_.getLong(0) == 5L).get
    assert(dup.getDouble(1) == 1.0)
    // qualityFilter: no crash, thresholds respected
    val qf = Pipeline.qualityFilter(hostile, "doc_id", "text", 2, 100, 0.0)
    assert(qf.count() > 0 && qf.filter(col("n_tokens") < 2).count() == 0)
    // packSequences: every doc lands in exactly one bin, bins start at 0
    val packed = Pipeline.packSequences(hostile, "doc_id", "text", "source", 4)
    assert(packed.count() == hostile.count())
    assert(packed.groupBy(col("source")).agg(min(col("bin")).as("m"))
      .filter(col("m") =!= 0).count() == 0)
    // weighted sample with weight floor 1 (empty text has n_chars 0 -> use length+1)
    val w = hostile.withColumn("wt", length(col("text")) + 1)
    val samp = Pipeline.weightedPrioritySample(w, "doc_id", "text", "wt", 3)
    assert(samp.count() == 3)
  }

  test("decontaminate removes exactly the test-set texts from train") {
    val docs = Tables.load(spark, dir, "documents")
    val train = docs
    val test = docs.filter(col("doc_id") % 10 === 0)
    val kept = Pipeline.decontaminate(train, test, "text")
    // no kept train text may appear in test
    assert(kept.join(test.select(col("text")), Seq("text"), "left_semi").count() == 0)
    // and everything dropped DOES appear in test
    val dropped = train.join(kept.select(col("doc_id")), Seq("doc_id"), "left_anti")
    assert(dropped.join(test.select(col("text")), Seq("text"), "left_anti").count() == 0)
  }
}
