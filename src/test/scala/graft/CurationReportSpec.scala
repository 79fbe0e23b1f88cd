package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.{Pipeline, Similarity}

/** Round-4 curation-report operators: curriculum bins, int8 quantization
  * error, repeated spans, OOV rate, per-dimension winsorization. */
class CurationReportSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"
  import scala.jdk.CollectionConverters._

  test("selectToBudget: greedy quality prefix per group, overshoot bounded by one doc") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 0.9, 100L), ("a", 2L, 0.8, 100L), ("a", 3L, 0.7, 100L), ("a", 4L, 0.6, 100L),
      ("b", 5L, 0.5, 300L), ("b", 6L, 0.4, 300L),
      ("c", 7L, 0.9, 50L)).toDF("g", "id", "q", "tok")
    val kept = Pipeline.selectToBudget(df, "g", "id", col("q"), col("tok"), 250L)
      .select(col("id")).as[Long].collect().toSet
    // a: exclusive cums 0/100/200/300 -> ids 1,2,3 (3 crosses the budget and
    // is included; 4 starts past it); b: 0/300 -> only 5; c: 7
    assert(kept == Set(1L, 2L, 3L, 5L, 7L))
    // equal quality ties break on the id
    val tie = Seq(("x", 2L, 1.0, 200L), ("x", 1L, 1.0, 200L)).toDF("g", "id", "q", "tok")
    val k2 = Pipeline.selectToBudget(tie, "g", "id", col("q"), col("tok"), 200L)
      .select(col("id")).as[Long].collect().toSet
    assert(k2 == Set(1L))
  }

  test("dedupSegments: boilerplate survives only in its first doc; all-dup docs come back empty") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta. cookie banner. gamma"),
      (2L, "cookie banner. delta epsilon"),
      (3L, "cookie banner"),
      (4L, "alpha beta. gamma")).toDF("doc_id", "text")
    val out = Pipeline.dedupSegments(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) == ("alpha beta. cookie banner. gamma", 3), "first doc keeps everything")
    assert(out(2L) == ("delta epsilon", 1), "boilerplate removed from later docs")
    assert(out(3L) == ("", 0), "doc made entirely of seen segments empties out")
    assert(out(4L) == ("", 0), "exact re-use of earlier segments empties out")
  }

  test("selectToBudget: high-cardinality group column trips the loud contract") {
    import spark.implicits._
    // ~1.3M distinct groups (group == id): the per-entity-key misuse the
    // contract exists for — must fail with the contract named, BEFORE the
    // sort/collect that would OOM the driver at scale
    val perEntity = spark.range(0, 1300000)
      .select(col("id").cast("string").as("g"), col("id"),
        lit(1.0).as("q"), lit(10L).as("tok"))
    val e = intercept[IllegalArgumentException] {
      Pipeline.selectToBudget(perEntity, "g", "id", col("q"), col("tok"), 100L)
    }
    assert(e.getMessage.contains("MaxPrefixScanGroups") ||
      e.getMessage.contains("distinct 'g' groups"))
  }

  test("property: selectToBudget == reference greedy prefix over random inputs") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      n <- Gen.choose(0, 120)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, 3)
        q <- Gen.choose(0, 9).map(_ / 10.0) // coarse qualities force ties
        tok <- Gen.choose(0L, 50L)
      } yield (g, q, tok))
      budget <- Gen.choose(1L, 300L)
      parts <- Gen.choose(1, 7)
    } yield (rows.zipWithIndex.map { case ((g, q, tok), i) => (g, i.toLong, q, tok) },
      budget, parts)
    val prop = Prop.forAll(gen) { case (rows, budget, parts) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (g, id, q, tok) =>
          org.apache.spark.sql.Row(g, id, q, tok)
        }, parts),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("q", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("tok", org.apache.spark.sql.types.LongType))))
      val got = Pipeline.selectToBudget(df, "g", "id", col("q"), col("tok"), budget)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      val ref = rows.groupBy(_._1).values.flatMap { grp =>
        val ordered = grp.sortBy { case (_, id, q, _) => (-q, id) }
        val cums = ordered.scanLeft(0L) { case (c, (_, _, _, tok)) => c + tok }
        ordered.zip(cums).collect { case ((_, id, _, _), cum) if cum < budget => id }
      }.toSet
      got == ref
    }
    val res = check(Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  test("property: dedupSegments == reference first-occurrence scan over random corpora") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // small segment alphabet forces heavy cross-doc duplication
    val seg = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val gen = for {
      n <- Gen.choose(0, 25)
      docs <- Gen.listOfN(n, Gen.choose(1, 6).flatMap(m => Gen.listOfN(m, seg)))
    } yield docs.zipWithIndex.map { case (segs, i) => (i.toLong, segs.mkString(". ")) }
    val prop = Prop.forAll(gen) { docs =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(docs.map { case (id, t) =>
          org.apache.spark.sql.Row(id, t)
        }, 3),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
      val got = Pipeline.dedupSegments(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val seen = scala.collection.mutable.Set.empty[String]
      val ref = docs.sortBy(_._1).map { case (id, t) =>
        val kept = t.split("\\.\\s+").filter(_.nonEmpty).filter(seen.add)
        id -> kept.mkString(". ")
      }.toMap
      got == ref
    }
    val res = check(Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  test("dedupSubstrings: cross-doc boilerplate span removed from every doc but its first") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // exactly one window at l=10
    val df = Seq(
      (0L, s"alpha beta $boiler gamma"),
      (1L, s"$boiler tail words here"),
      (2L, "too short to window"),
      (3L, ""),
      (4L, s"prefix $boiler")).toDF("doc_id", "text")
    val got = Pipeline.dedupSubstrings(df, "doc_id", "text", l = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    // doc 0 holds the first occurrence (windows also cover alpha/beta spans:
    // its own windows are all FIRST occurrences, nothing removed)
    assert(got(0L)._1 == s"alpha beta $boiler gamma" && got(0L)._4 == 0)
    // docs 1 and 4: their boilerplate windows duplicate doc 0's -> covered
    // tokens removed, surrounding text survives
    assert(got(1L)._1 == "tail words here" && got(1L)._4 == 10, s"got ${got(1L)}")
    assert(got(4L)._1 == "prefix" && got(4L)._4 == 10, s"got ${got(4L)}")
    // shorter than l: passes through whole
    assert(got(2L) == (("too short to window", 4, 4, 0)))
    assert(got(3L)._4 == 0)
  }

  test("property: dedupSubstrings == reference first-occurrence coverage scan") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val l = 3
    // tiny token alphabet forces heavy window collisions, within and across docs
    val tok = Gen.oneOf("x", "y", "z")
    val gen = for {
      n <- Gen.choose(0, 12)
      docs <- Gen.listOfN(n, Gen.choose(0, 9).flatMap(m => Gen.listOfN(m, tok)))
    } yield docs.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
    val prop = Prop.forAll(gen) { docs =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(docs.map { case (id, t) =>
          org.apache.spark.sql.Row(id, t)
        }, 3),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
      val got = Pipeline.dedupSubstrings(df, "doc_id", "text", l = l)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(4)))).toMap
      // reference: sequential scan in (doc, start) order; split-with-limit
      // -1 semantics to mirror tokens() exactly (incl. the [""] empty doc)
      val first = scala.collection.mutable.Set.empty[String]
      val ref = docs.sortBy(_._1).map { case (id, t) =>
        val ts = t.replaceAll("^ +| +$", "").split("\\s+", -1)
        val removed = Array.fill(ts.length)(false)
        (0 to ts.length - l).foreach { s0 =>
          val w = ts.slice(s0, s0 + l).mkString(" ")
          if (!first.add(w)) (s0 until s0 + l).foreach(removed(_) = true)
        }
        val kept = ts.indices.filterNot(removed).map(ts)
        id -> ((kept.mkString(" "), removed.count(identity)))
      }.toMap
      got == ref
    }
    val res = check(Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  test("curriculumBins: equal-population tiers with non-overlapping bounds") {
    val docs = Tables.load(spark, dir, "documents")
    val total = docs.count()
    val bins = Pipeline.curriculumBins(docs, "doc_id", "n_chars",
      graft.functions.token_count(col("text")).cast("long"), nBins = 4)
      .collect().sortBy(_.getInt(0))
    assert(bins.length === 4)
    val counts = bins.map(_.getLong(1))
    assert(counts.sum === total)
    assert(counts.max - counts.min <= 1, s"ntile bins must be equal-population ±1: ${counts.toSeq}")
    // bounds ordered across bins (ties across the boundary are legal)
    bins.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2), s"bin ${a.getInt(0)} hi > bin ${b.getInt(0)} lo")
    }
  }

  test("quantizeInt8Report: error bounded by half a quantization step") {
    val emb = Tables.load(spark, dir, "embeddings")
    // per-element |err| <= 0.5/scale = 0.5*max|x|/127 — check per label
    // against that label's worst max|x|
    val rep = Similarity.quantizeInt8Report(emb, "vec_id", "embedding", "label")
    val worstM = emb.select(col("label").cast("long").as("label"),
        array_max(transform(graft.functions.vec_double(col("embedding")), x => abs(x))).as("m"))
      .groupBy("label").agg(max(col("m")).as("m"))
    val joined = rep.join(worstM, "label").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val maxErr = r.getAs[Double]("max_abs_err")
      val m = r.getAs[Double]("m")
      assert(maxErr <= 0.5 * m / 127.0 * (1 + 1e-9),
        s"label ${r.getAs[Long]("label")}: max_abs_err $maxErr exceeds half-step bound")
      assert(r.getAs[Double]("mean_sse") >= 0.0)
    }
  }

  test("repeatedSpans: finds an injected span, and every reported span is real") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today ok"),
      (2L, "prefix words the quick brown fox jumps over the lazy dog and more"),
      (3L, "completely different content with no overlap at all whatsoever here now"),
      (4L, "short doc")
    ).toDF("doc_id", "text")
    val spans = Pipeline.repeatedSpans(docs, "text", n = 8, minDocs = 2L, k = 10).collect()
    assert(spans.exists(_.getString(0) == "the quick brown fox jumps over the lazy"),
      s"injected 8-token span not found: ${spans.map(_.getString(0)).toSeq}")
    val texts = docs.select("text").as[String].collect()
    spans.foreach { r =>
      val n = texts.count(_.contains(r.getString(0)))
      assert(n >= 2, s"span '${r.getString(0)}' reported in ${r.getLong(1)} docs but contained in $n")
    }
  }

  test("oovRate: full vocabulary means zero OOV; rates in [0,1]") {
    val docs = Tables.load(spark, dir, "documents")
    val rates = Pipeline.oovRate(docs, "source", "text", vocabSize = 500).collect()
    assert(rates.nonEmpty)
    rates.foreach { r =>
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
    }
    // vocab covering every distinct token → all OOV counts are zero
    val nDistinct = docs
      .select(explode(graft.functions.tokens_fast(lower(col("text")))).as("t"))
      .distinct().count().toInt
    val full = Pipeline.oovRate(docs, "source", "text", vocabSize = nDistinct).collect()
    assert(full.forall(_.getAs[Long]("n_oov") == 0L))
  }

  test("dimWinsorReport: clip fractions match the percentile definition") {
    val emb = Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    val rep = Similarity.dimWinsorReport(emb, "embedding", 0.05, 0.95).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      assert(r.getAs[Double]("p_lo") <= r.getAs[Double]("p_hi"))
      // linear-interpolation percentile: strictly-below count is at most
      // ceil(q*n), and clipping must leave at least 90% of mass
      assert(r.getAs[Long]("n_below") <= math.ceil(0.05 * n).toLong)
      assert(r.getAs[Long]("n_above") <= math.ceil(0.05 * n).toLong)
    }
  }

  test("minhashLshAgainst == full-corpus minhashLsh restricted to cross-side pairs") {
    val docs = Tables.load(spark, dir, "documents")
    val idx = docs.filter(col("doc_id") % 2 === 0)
    val delta = docs.filter(col("doc_id") % 2 === 1)
    val got = graft.operators.Dedup.minhashLshAgainst(idx, delta, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // full self-join pairs, keep only (even, odd) in either orientation
    val full = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .collect {
        case (a, b) if a % 2 == 0 && b % 2 == 1 => (a, b)
        case (a, b) if a % 2 == 1 && b % 2 == 0 => (b, a)
      }.toSet
    assert(got === full, s"cross-side pairs diverge: got ${got.size}, expected ${full.size}")
    assert(got.forall { case (a, b) => a % 2 == 0 && b % 2 == 1 },
      "output must contain only (index, delta) pairs")
  }

  test("parseWithQuarantine: malformed matrix — truncated, garbage, empty, wrong shape") {
    import spark.implicits._
    val rows = Seq(
      (1L, """{"id":1,"lang":"en"}"""),      // valid
      (2L, """{"id":2,"lang":"en""""),        // truncated
      (3L, """not json at all"""),            // garbage
      (4L, ""),                               // empty
      (5L, """[1,2,3]"""),                    // wrong shape (array)
      (6L, """{"id":"x","lang":"de"}"""))     // type mismatch on id
      .toDF("doc_id", "raw")
    val out = graft.operators.Pipeline.parseWithQuarantine(
        rows, "doc_id", "raw", "id BIGINT, lang STRING")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out(1L)._1 && out(1L)._2.contains(1L) && out(1L)._3.contains("en"))
    Seq(2L, 3L, 4L, 5L).foreach { id =>
      assert(!out(id)._1, s"doc $id must be quarantined")
      assert(out(id)._2.isEmpty && out(id)._3.isEmpty,
        s"quarantined doc $id must not leak parsed fields")
    }
    // PERMISSIVE type mismatch: id unparseable → corrupt → quarantined
    assert(!out(6L)._1, "type-mismatched record must be quarantined")
    // no row lost either way
    assert(out.size == 6)
  }

  test("chopExamples: contiguous example coverage and replay identity") {
    val docs = Tables.load(spark, dir, "documents")
    val out = graft.operators.Pipeline.chopExamples(
        docs, "doc_id", graft.functions.token_count(col("text")), 128L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val byOrd = out.sortBy(_._2)
    // token stream is contiguous: each doc starts where the previous ended
    byOrd.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._3 == a._3 + a._4, s"gap between ord ${a._2} and ${b._2}")
      case _ =>
    }
    out.foreach { case (_, _, ts, t, fe, le, off) =>
      assert(fe == ts / 128 && off == ts % 128)
      assert(le == (ts + t - 1) / 128)
      assert(le >= fe, "last example precedes first")
    }
    // total examples = ceil(total tokens / 128), anchored by the last doc
    val last = byOrd.last
    val total = last._3 + last._4
    assert(last._6 == (total - 1) / 128)
  }

  test("clusterAwareSplits: no near-dup cluster straddles a split; every doc assigned") {
    val docs = Tables.load(spark, dir, "documents")
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = graft.operators.Pipeline.clusterAwareSplits(
      docs, "doc_id", "text", weights)
    assert(out.count() == docs.count(), "every document must get a split")
    val straddling = out.groupBy(col("rep"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddling == 0, "a cluster must never straddle splits")
    // the construction must actually cluster something (planted near-dups)
    val clustered = out.filter(col("rep") =!= col("doc_id")).count()
    assert(clustered > 0, "corpus should contain near-dup clusters")
    // and plain content splits DO straddle at least one of those clusters
    // (the leakage this construction exists to prevent)
    val plain = graft.operators.Pipeline.assignSplits(docs, "text", weights)
      .select(col("doc_id"), col("split").as("psplit"))
    val plainStraddle = out.select(col("doc_id"), col("rep"))
      .join(plain, "doc_id")
      .groupBy(col("rep")).agg(countDistinct(col("psplit")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(plainStraddle > 0,
      "content-hash splits should straddle some cluster — else the fixture is trivial")
  }

  test("windowAnomalies: a planted burst window is flagged, steady keys are not") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def row(id: Long, key: String, winIdx: Int, offs: Int) =
      (id, key, new java.sql.Timestamp(base + winIdx * 3600000L + offs * 1000L))
    // key "steady": 5 events in each of 10 hourly windows (z = 0 everywhere);
    // key "bursty": 5 events in 9 windows, 50 in window 4
    var id = 0L
    val rows = (0 until 10).flatMap { w =>
      (0 until 5).map { i => id += 1; row(id, "steady", w, i) }
    } ++ (0 until 10).flatMap { w =>
      val n = if (w == 4) 50 else 5
      (0 until n).map { i => id += 1; row(id, "bursty", w, i) }
    }
    val df = rows.toDF("event_id", "key", "ts")
    val got = graft.operators.Events.windowAnomalies(
        df, "key", "ts", windowMs = 3600000L, zThreshold = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1) - base / 3600000L))
    assert(got.toSeq == Seq(("bursty", 4L)),
      s"exactly the planted burst must be flagged: ${got.toSeq}")
  }

  test("transitionCounts: hand-built journey matrix") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(s: Int) = new java.sql.Timestamp(ts0.getTime + s * 1000L)
    // user 1: a -> b -> a ; user 2: b -> b
    val ev = Seq(
      (1L, 1L, at(0), "a"), (2L, 1L, at(1), "b"), (3L, 1L, at(2), "a"),
      (4L, 2L, at(0), "b"), (5L, 2L, at(1), "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.operators.Events.transitionCounts(
        ev, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("b", "b") -> 1L),
      s"got $got")
  }

  test("interleaveByWeight: proportional spacing, alternation, sequential-replay identity") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, if (i < 10) "a" else if (i < 20) "b" else "c"))
      .toDF("doc_id", "source")
    // equal weights: two sources alternate perfectly
    val ab = graft.operators.Pipeline.interleaveByWeight(
        docs.filter(col("source") =!= "c"), "doc_id", "source",
        Seq("a" -> 1, "b" -> 1))
      .orderBy(col("ord")).collect().map(_.getString(1))
    assert(ab.grouped(2).forall(p => p.toSet == Set("a", "b")),
      s"equal weights must alternate: ${ab.mkString}")
    // 2:1 — the heavy source takes 2 of every 3 slots
    val w21 = graft.operators.Pipeline.interleaveByWeight(
        docs.filter(col("source") =!= "c"), "doc_id", "source",
        Seq("a" -> 2, "b" -> 1))
      .orderBy(col("ord")).collect().map(_.getString(1))
    assert(w21.take(15).grouped(3).forall(_.count(_ == "a") == 2),
      s"2:1 must give the heavy source 2 of every 3 early slots: ${w21.mkString}")
    // sequential replay: sort the slot keys on the driver, positions match
    val got = graft.operators.Pipeline.interleaveByWeight(
        docs, "doc_id", "source", Seq("a" -> 3, "b" -> 2, "c" -> 1))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val ws = Map("a" -> 3, "b" -> 2, "c" -> 1)
    val want = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).toSeq.flatMap { case (s, rows) =>
        rows.map(_._1).sorted.zipWithIndex.map { case (id, j) =>
          (id, s, (2.0 * j + 1) / ws(s)) }
      }
      .sortBy { case (id, s, k) => (k, s, id) }
      .zipWithIndex.map { case ((id, _, _), ord) => (id, ord.toLong) }.toMap
    assert(got == want, s"diverges from sequential replay")
  }

  test("mixturePlan: targets from weights, rates capped at 1") {
    val docs = Tables.load(spark, dir, "documents")
    // zh gets an absurd weight so its target exceeds availability → rate 1.0
    val plan = graft.operators.Pipeline.mixturePlan(
      docs, "lang", graft.functions.token_count(col("text")).cast("long"),
      Seq("en" -> 0.1, "zh" -> 100.0), totalTarget = 10000L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(plan.keySet === Set("en", "zh"))
    assert(plan("zh").getAs[Double]("rate") === 1.0)
    assert(plan("en").getAs[Long]("tok_target") === 1000L)
    val en = plan("en")
    assert(en.getAs[Double]("rate") ===
      math.min(1.0, en.getAs[Long]("tok_target").toDouble / en.getAs[Long]("tok_avail").toDouble))
  }

  test("exportShards: contiguous id ranges, imbalance bounded by the largest doc") {
    val docs = Tables.load(spark, dir, "documents")
    val tok = graft.functions.token_count(col("text")).cast("long")
    val shards = graft.operators.Pipeline.exportShards(docs, "doc_id", tok, 8)
      .collect().sortBy(_.getInt(0))
    assert(shards.map(_.getInt(0)).toSeq == (0 until 8))
    assert(shards.map(_.getLong(1)).sum === docs.count())
    // contiguity: id ranges strictly ordered and non-overlapping
    shards.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("id_hi") < b.getAs[Long]("id_lo"))
    }
    val masses = shards.map(_.getAs[Long]("tok_mass"))
    val maxDoc = docs.select(max(tok)).head().getLong(0)
    assert(masses.max - masses.min <= 2 * maxDoc,
      s"shard imbalance ${masses.max - masses.min} exceeds 2x largest doc $maxDoc")
  }

  test("hostile inputs: round-4 operators survive empty/degenerate rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "n_chars")
    assert(Pipeline.curriculumBins(empty, "doc_id", "n_chars",
      graft.functions.token_count(col("text")).cast("long"), 4).count() === 0)
    assert(Pipeline.repeatedSpans(empty, "text", 8, 2, 10).count() === 0)
    assert(Pipeline.oovRate(empty, "text", "text", 10).count() === 0)
    assert(Pipeline.mixturePlan(empty, "text",
      graft.functions.token_count(col("text")).cast("long"), Seq("x" -> 1.0), 100).count() === 0)
    assert(Pipeline.exportShards(empty, "doc_id",
      graft.functions.token_count(col("text")).cast("long"), 8).count() === 0)
    // degenerate docs: empty text, single token, whitespace
    val weird = Seq((1L, "", 0L), (2L, "tok", 3L), (3L, "   ", 3L)).toDF("doc_id", "text", "n_chars")
    assert(Pipeline.curriculumBins(weird, "doc_id", "n_chars",
      graft.functions.token_count(col("text")).cast("long"), 4).count() > 0)
    assert(Pipeline.exportShards(weird, "doc_id",
      graft.functions.token_count(col("text")).cast("long"), 2)
      .agg(sum(col("n_docs"))).head().getLong(0) === 3L)
    // zero vector: quantization must not divide by zero
    val z = Seq((1L, Array(0f, 0f, 0f), 0), (2L, Array(1f, -2f, 3f), 0))
      .toDF("vec_id", "embedding", "label")
    val rep = Similarity.quantizeInt8Report(z, "vec_id", "embedding", "label").collect()
    assert(rep.length === 1)
    assert(!rep.head.getAs[Double]("max_abs_err").isNaN)
    assert(!rep.head.getAs[Double]("mean_sse").isNaN)
    // late-round family: null text / empty docs / empty frames
    val nullDocs = Seq((1L, null: String, "b"), (2L, "same text here ok", "b"),
      (3L, "same text here ok", "b")).toDF("doc_id", "text", "blk")
    val pairs = graft.operators.Dedup.charNgramPairs(
      nullDocs, "doc_id", "text", "blk", 5, 0.7).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((2L, 3L)),
      "null text must not pair; identical docs must")
    val emptyDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "blk")
    assert(graft.operators.Dedup.charNgramPairs(
      emptyDocs, "doc_id", "text", "blk", 5, 0.7).count() === 0)
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val oneCent = Seq((0L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    assert(Similarity.semanticDedupPairs(emptyVecs, "vec_id", "embedding",
      oneCent, "vec_id", "embedding", 0.5).count() === 0)
  }

  test("frameSample: offsets monotonic and within the payload") {
    import spark.implicits._
    val docs = Seq((1L, "0123456789abcdef"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
      .withColumn("bin", encode(col("text"), "UTF-8"))
      .withColumn("media", graft.operators.Media.asMedia("bin", "text/plain"))
    val frames = graft.operators.Media.frameSample(docs, "doc_id", "media", 4)
      .collect().groupBy(_.getLong(0))
    assert(frames.keySet === Set(1L, 2L, 3L))
    frames.foreach { case (id, rows) =>
      val offs = rows.sortBy(_.getInt(1)).map(_.getInt(2))
      assert(offs.length === 4)
      assert(offs.sliding(2).forall { case Array(a, b) => a <= b })
      assert(offs.head === 0)
    }
  }

  test("curriculumBins/exportShards plans: no single-partition global Window") {
    val docs = Tables.load(spark, dir, "documents")
    val tok = graft.functions.token_count(col("text")).cast("long")
    val p1 = Pipeline.curriculumBins(docs, "doc_id", "n_chars", tok, 4)
      .queryExecution.executedPlan.toString
    val p2 = Pipeline.exportShards(docs, "doc_id", tok, 8)
      .queryExecution.executedPlan.toString
    // the global order comes from the range-partitioned rankedScan, never
    // from a partitionless Window (which Spark runs on ONE partition)
    assert(!p1.contains("Window"), s"global window leaked into curriculumBins:\n$p1")
    assert(!p2.contains("Window"), s"global window leaked into exportShards:\n$p2")
  }

  test("round-4 plan shapes: single-exchange reports, broadcast dimension joins") {
    import org.apache.spark.sql.execution.FormattedMode
    // count data shuffles (hash repartition); the tiny final ORDER BY's
    // rangepartitioning exchange is presentation, not data movement
    def shuffles(p: String): Int = "Exchange hashpartitioning".r.findAllIn(p).size
    val emb = Tables.load(spark, dir, "embeddings")
    // q67: per-vector math is row-local; only the label rollup shuffles
    val p67 = Similarity.quantizeInt8Report(emb, "vec_id", "embedding", "label")
      .queryExecution.explainString(FormattedMode)
    assert(shuffles(p67) <= 1, s"quantize report should shuffle once (label rollup):\n$p67")
    // q72: one corpus aggregate; the weights dimension broadcasts
    val docs = Tables.load(spark, dir, "documents")
    val p72 = Pipeline.mixturePlan(docs, "lang",
      graft.functions.token_count(col("text")).cast("long"), Seq("en" -> 1.0), 100L)
      .queryExecution.explainString(FormattedMode)
    assert(p72.contains("BroadcastHashJoin"), s"weights dim should broadcast:\n$p72")
    assert(shuffles(p72) <= 1, s"mixture plan should shuffle once (group counts):\n$p72")
  }

  test("oovRate plan: vocabulary broadcasts into the anti join") {
    val docs = Tables.load(spark, dir, "documents")
    val plan = Pipeline.oovRate(docs, "source", "text", vocabSize = 500)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"anti join should broadcast the bounded vocabulary:\n$plan")
  }

  test("curate: identical to the hand-composed stage chain") {
    val docs = Tables.load(spark, dir, "documents")
    val evalSplit = docs.filter(substring(md5(col("text")), 1, 2) < "10")
    val train = docs.filter(substring(md5(col("text")), 1, 2) >= "10")
    val got = Pipeline.curate(train, evalSplit, "doc_id", "text", "lang",
      langs = Seq("en", "de"), minTokens = 10, maxTokens = 200,
      minDistinctRatio = 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // independent formulation: each stage applied separately
    val quality = Pipeline.qualityFilter(
      train.filter(col("lang").isin("en", "de")),
      "doc_id", "text", 10, 200, 0.2)
    val keepIds = quality.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val evalHashes = evalSplit.select(md5(col("text")).as("h"))
      .collect().map(_.getString(0)).toSet
    val want = quality
      .filter(col("doc_id").isInCollection(keepIds))
      .withColumn("h", md5(col("text")))
      .collect().filterNot(r => evalHashes.contains(r.getAs[String]("h")))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got === want)
    assert(got.nonEmpty, "curation chain should leave survivors at these thresholds")
  }

  test("curate: empty eval split decontaminates nothing; empty allowlist rejected") {
    val docs = Tables.load(spark, dir, "documents")
    val none = docs.filter(lit(false))
    val full = Pipeline.curate(docs, none, "doc_id", "text", "lang",
      Seq("en", "de", "es", "fr", "zh"), 1, Int.MaxValue, 0.0)
    val dedupOnly = docs.groupBy(col("text")).agg(min(col("doc_id")))
    assert(full.count() === dedupOnly.count(),
      "with no eval set and open thresholds, curation = exact dedup")
    assertThrows[IllegalArgumentException] {
      Pipeline.curate(docs, none, "doc_id", "text", "lang", Seq.empty, 1, 10, 0.0)
    }
  }

  test("hostile inputs: curation/report operators survive empty frames") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    assert(Pipeline.corpusDiff(empty, empty, "doc_id", "text").count() === 0)
    assert(Pipeline.dataCard(empty, "source", "lang", "text").count() === 0)
    assert(Pipeline.groupExemplars(empty, "doc_id", "text", "source", 3).count() === 0)
    assert(Pipeline.curate(empty, empty, "doc_id", "text", "lang",
      Seq("en"), 1, 10, 0.0).count() === 0)
    // one-sided diff: everything added / everything removed
    val one = Seq((1L, "x")).toDF("doc_id", "text")
    val none = one.filter(lit(false))
    assert(Pipeline.corpusDiff(none, one, "doc_id", "text")
      .collect().map(_.getString(1)).toSeq === Seq("added"))
    assert(Pipeline.corpusDiff(one, none, "doc_id", "text")
      .collect().map(_.getString(1)).toSeq === Seq("removed"))
  }

  test("assignSplits: content-stable, exhaustive, proportional; bad weights rejected") {
    val docs = Tables.load(spark, dir, "documents")
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Pipeline.assignSplits(docs, "text", weights)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(a.size === docs.count(), "every document must get a split")
    // content-stable: the assignment of surviving docs is unchanged when
    // the corpus shrinks (a doc's fate depends only on its own text)
    val b = Pipeline.assignSplits(docs.filter(col("doc_id") % 3 === 0), "text", weights)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    b.foreach { case (id, s) => assert(a(id) === s, s"doc $id changed split") }
    // proportions within a loose binomial band at n=500
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac far from 0.8")
    assertThrows[IllegalArgumentException] {
      Pipeline.assignSplits(docs, "text", Seq("a" -> 1.0, "a" -> 1.0))
    }
    assertThrows[IllegalArgumentException] {
      Pipeline.assignSplits(docs, "text", Seq("a" -> 0.0))
    }
  }

  test("corpusDiff: identical snapshots diff empty; planted edits classified") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    assert(Pipeline.corpusDiff(docs, docs, "doc_id", "text").count() === 0,
      "a corpus diffed against itself must report nothing")
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("doc_id", "text")
    val got = Pipeline.corpusDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // null text is a present row, not an absence: null->null is unchanged,
    // null->value and value->null are changes
    val n1 = Seq[(Long, String)]((1L, null), (2L, null), (3L, "x")).toDF("doc_id", "text")
    val n2 = Seq[(Long, String)]((1L, null), (2L, "y"), (3L, null)).toDF("doc_id", "text")
    val gotN = Pipeline.corpusDiff(n1, n2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotN === Map(2L -> "changed", 3L -> "changed"))
  }

  test("dataCard: shares sum to exactly 1, total broadcast not windowed") {
    val docs = Tables.load(spark, dir, "documents")
    val card = Pipeline.dataCard(docs, "source", "lang", "text")
    val rows = card.collect()
    assert(rows.length > 1)
    val shareSum = rows.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares must cover the corpus: $shareSum")
    val docSum = rows.map(_.getAs[Long]("n_docs")).sum
    assert(docSum === docs.count(), "every document lands in exactly one cell")
    val plan = card.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Window"),
      s"the total must come from a broadcast aggregate, not an all-rows window:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"one-row total should broadcast:\n$plan")
  }

  test("groupExemplars: k per group, content-deterministic under repartition") {
    val docs = Tables.load(spark, dir, "documents")
    val a = Pipeline.groupExemplars(docs, "doc_id", "text", "source", k = 3)
      .select("source", "rn", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted
    assert(a.groupBy(_._1).values.forall(_.length <= 3))
    assert(a.nonEmpty)
    val b = Pipeline.groupExemplars(docs.repartition(13, col("doc_id")),
      "doc_id", "text", "source", k = 3)
      .select("source", "rn", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted
    assert(a.toSeq === b.toSeq, "exemplar choice must not depend on partitioning")
    assertThrows[IllegalArgumentException] {
      Pipeline.groupExemplars(docs, "doc_id", "text", "source", k = 0)
    }
  }

  test("dsirSelect: weights match a sequential reference, target vocab outranks") {
    import spark.implicits._
    // two disjoint vocabularies: target docs speak A, off-target speak B,
    // and two probe docs (one per vocabulary) are scored by resemblance
    val tgt = (0 until 6).map(i => (i.toLong, s"alpha beta gamma delta tok$i", true))
    val raw = (0 until 6).map(i => (10L + i, s"zik zork blarg quux tok$i", false))
    val probes = Seq((100L, "alpha beta gamma delta", false),
      (101L, "zik zork blarg quux", false))
    val df = (tgt ++ raw ++ probes).toDF("doc_id", "text", "is_t")
    val got = Pipeline.dsirSelect(df, "doc_id", "text", col("is_t"), n = 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap

    // sequential reference: same md5 3-hex bucketing, same quantized
    // log-ratio (length(bin(x))-1 == 63-nlz for x>0, 0 for x==0)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def bucket(f: String): Int = Integer.parseInt(md5hex(f).take(3), 16)
    def flog2(x: Long): Long = if (x == 0) 0 else 63 - java.lang.Long.numberOfLeadingZeros(x)
    val all = (tgt ++ raw ++ probes).map { case (id, text, t) =>
      val w = text.trim.split("\\s+").toSeq
      val feats = w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      (id, feats.map(bucket), t)
    }
    val rCnt = all.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tCnt = all.filter(_._3).flatMap(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    def s(bk: Int): Long =
      flog2(((tCnt.getOrElse(bk, 0L) + 1) * 65536L) / (rCnt(bk) + 1)) - 16
    val want = all.map { case (id, bks, _) =>
      id -> (bks.size.toLong, bks.map(s).sum)
    }.toMap
    want.foreach { case (id, (nf, lw)) =>
      assert(got(id)._1 == nf && got(id)._2 == lw,
        s"doc $id: got ${got(id)}, want ($nf, $lw)")
    }
    // the target-vocabulary probe must outscore the off-target probe, and
    // the top-7 selection is exactly the 7 A-speakers (6 targets + probe)
    assert(got(100L)._2 > got(101L)._2,
      s"target-like probe must outrank: ${got(100L)._2} <= ${got(101L)._2}")
    val selected = got.filter(_._2._3).keySet
    assert(selected == (tgt.map(_._1).toSet + 100L),
      s"selection must be the A-speakers, got $selected")
  }

  test("nbQualityScores: seeds train, unlabeled probes classify by vocabulary") {
    import spark.implicits._
    // labeled seeds speak disjoint vocabularies; probes are UNLABELED
    // (neither seed flag) and must classify by which vocabulary they use
    val pos = (0 until 6).map(i => (i.toLong, s"clean prose flows nicely tok$i", "p"))
    val neg = (0 until 6).map(i => (10L + i, s"spam junk noise garbage tok$i", "n"))
    val probes = Seq((100L, "clean prose flows nicely", "u"),
      (101L, "spam junk noise garbage", "u"))
    val df = (pos ++ neg ++ probes).toDF("doc_id", "text", "cls")
    val got = Pipeline.nbQualityScores(df, "doc_id", "text",
      posSeed = col("cls") === "p", negSeed = col("cls") === "n")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

    // sequential reference replaying the same integer arithmetic
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def bucket(f: String): Int = Integer.parseInt(md5hex(f).take(3), 16)
    def flog2(x: Long): Long = if (x == 0) 0 else 63 - java.lang.Long.numberOfLeadingZeros(x)
    val all = (pos ++ neg ++ probes).map { case (id, text, cls) =>
      val w = text.trim.split("\\s+").toSeq
      val feats = w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      (id, feats.map(bucket), cls)
    }
    val pCnt = all.filter(_._3 == "p").flatMap(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val nCnt = all.filter(_._3 == "n").flatMap(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val (tp, tn) = (pCnt.values.sum, nCnt.values.sum)
    def w(bk: Int): Long =
      flog2(((pCnt.getOrElse(bk, 0L) + 1) * 65536L) / (tp + 4096)) -
        flog2(((nCnt.getOrElse(bk, 0L) + 1) * 65536L) / (tn + 4096))
    val (dp, dn) = (pos.size.toLong, neg.size.toLong)
    val prior = flog2((dp + 1) * 65536L / (dp + dn + 2)) -
      flog2((dn + 1) * 65536L / (dp + dn + 2))
    all.foreach { case (id, bks, _) =>
      val want = (bks.size.toLong, bks.map(w).sum + prior)
      assert(got(id)._1 == want._1 && got(id)._2 == want._2,
        s"doc $id: got ${got(id)}, want $want")
    }
    assert(got(100L)._3, "pos-vocabulary probe must classify positive")
    assert(!got(101L)._3, "neg-vocabulary probe must classify negative")
    assert(got(100L)._2 > got(101L)._2)
  }

  test("nbQualityScores: corpus-only buckets keep the smoothed floor weight") {
    import spark.implicits._
    // the probe's vocabulary is DISJOINT from both seed vocabularies: its
    // feature buckets were never observed in training, so each must score
    // the add-one-smoothed cp=0/cn=0 floor weight — and count in n_feats —
    // exactly as the all-rows count formulation produced. (The train pass
    // now tokenizes seed rows only and range-fills the 4096-bucket weight
    // table; an inner score join that silently DROPPED unseen buckets
    // would fail this.)
    val pos = (0 until 4).map(i => (i.toLong, s"clean prose flows tok$i", "p"))
    val neg = (0 until 4).map(i => (10L + i, s"spam junk noise tok$i", "n"))
    val probe = Seq((100L, "xylophone quasar bumblebee", "u"))
    val df = (pos ++ neg ++ probe).toDF("doc_id", "text", "cls")
    val got = Pipeline.nbQualityScores(df, "doc_id", "text",
      posSeed = col("cls") === "p", negSeed = col("cls") === "n")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def bucket(f: String): Int = Integer.parseInt(md5hex(f).take(3), 16)
    def flog2(x: Long): Long = if (x == 0) 0 else 63 - java.lang.Long.numberOfLeadingZeros(x)
    val seedFeats = (pos ++ neg).map { case (id, text, cls) =>
      val w = text.trim.split("\\s+").toSeq
      (cls, w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
    }
    val pCnt = seedFeats.filter(_._1 == "p").flatMap(_._2).map(bucket)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nCnt = seedFeats.filter(_._1 == "n").flatMap(_._2).map(bucket)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (tp, tn) = (pCnt.values.sum, nCnt.values.sum)
    def w(bk: Int): Long =
      flog2(((pCnt.getOrElse(bk, 0L) + 1) * 65536L) / (tp + 4096)) -
        flog2(((nCnt.getOrElse(bk, 0L) + 1) * 65536L) / (tn + 4096))
    val prior = flog2(5L * 65536L / 10L) - flog2(5L * 65536L / 10L)
    val pw = probe.head._2.trim.split("\\s+").toSeq
    val pFeats = pw ++ pw.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    val want = (pFeats.size.toLong, pFeats.map(f => w(bucket(f))).sum + prior)
    assert(pFeats.map(bucket).forall(bk => !pCnt.contains(bk) && !nCnt.contains(bk)),
      "fixture invariant: probe buckets must be unseen in the seeds")
    assert(got(100L) == want,
      s"unseen-bucket probe: got ${got(100L)}, want $want")
  }

  test("ccnetBuckets: tercile boundary rule holds per language, buckets ordered by score") {
    import graft.operators.Pipeline
    val docs = Tables.load(spark, dir, "documents")
    val got = Pipeline.ccnetBuckets(docs, "doc_id", "text", "lang", vocabSize = 16)
      .select("doc_id", "lang", "q", "bucket")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(got.length == docs.count(), "every doc lands in exactly one bucket")
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val n = rows.length.toLong
      val byB = rows.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      val head = byB.getOrElse("head", Array.empty[Long])
      val mid = byB.getOrElse("middle", Array.empty[Long])
      val tail = byB.getOrElse("tail", Array.empty[Long])
      // cum-count boundary rule: head covers at least ceil(n/3), head+middle
      // at least ceil(2n/3) (ties share a bucket, so sizes can exceed)
      assert(head.length >= (n + 2) / 3, s"$lang: head ${head.length} of $n")
      assert(head.length + mid.length >= (2 * n + 2) / 3, s"$lang: head+middle of $n")
      // buckets are ordered by the quantized score: head <= middle <= tail
      if (head.nonEmpty && mid.nonEmpty) assert(head.max <= mid.min)
      if (mid.nonEmpty && tail.nonEmpty) assert(mid.max < tail.min,
        s"$lang: a middle score ties into tail — boundary rule broken")
    }
  }

  test("curationFunnel: stage counts are monotone and the final stage equals curate()") {
    import graft.operators.Pipeline
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, dir, "documents")
    val ev = docs.filter(substring(md5(col("text")), 1, 2) < "08")
    val tr = docs.filter(substring(md5(col("text")), 1, 2) >= "08")
    val f = Pipeline.curationFunnel(tr, ev, "doc_id", "text", "lang",
      Seq("en", "de", "fr"), 15, 150, 0.20).head()
    val (nIn, nLang, nQ, nD, nF) =
      (f.getLong(0), f.getLong(1), f.getLong(2), f.getLong(3), f.getLong(4))
    assert(nIn >= nLang && nLang >= nQ && nQ >= nD && nD >= nF,
      s"funnel must be monotone: $nIn >= $nLang >= $nQ >= $nD >= $nF")
    assert(nIn == tr.count())
    assert(nF == Pipeline.curate(tr, ev, "doc_id", "text", "lang",
      Seq("en", "de", "fr"), 15, 150, 0.20).count())
    assert(nF > 0, "fixture should survive the funnel")
  }

  test("bm25TopK: rare-term docs outrank common-term docs; scores monotone; no term-free hits") {
    import graft.operators.Pipeline
    import spark.implicits._
    // controlled vocabulary: doc 1 is the ONLY doc with the query's rare
    // term; docs 2-9 share only the common filler term; doc 50 has no
    // query term at all and must not appear
    val corpus = (Seq(
      (1L, "filler zebra filler filler"),
      (50L, "nothing shared here at all")) ++
      (2L to 9L).map(i => (i, "filler filler filler filler"))).toDF("doc_id", "text")
    val queries = Seq((0L, "zebra filler")).toDF("doc_id", "text")
    val got = Pipeline.bm25TopK(queries, corpus, "doc_id", "text", "doc_id", "text", k = 10)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(got.head._2 == 1L, s"the unique rare-term doc must rank first: ${got.toSeq}")
    assert(!got.exists(_._2 == 50L), "a doc sharing no query term must not score")
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 >= b._3, "score rose down the ranking")
    case _ => }
    // on the real corpus: ranking exists for every query, scores monotone
    val docs = Tables.load(spark, dir, "documents")
    val real = Pipeline.bm25TopK(docs.filter(col("doc_id") < 10), docs,
        "doc_id", "text", "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byQ = real.groupBy(_._1)
    assert(byQ.size == 10)
    byQ.foreach { case (q, rows) =>
      rows.sortBy(_._2).sliding(2).foreach { case Array(a, b) =>
        assert(a._4 >= b._4, s"query $q: score rose down the ranking")
      case _ => }
    }
  }

  test("rrfFuse: a doc in both lists outranks equal-rank single-list docs; exact contributions") {
    import graft.operators.Pipeline
    import spark.implicits._
    // query 1: doc 100 is rank 1 in BOTH lists; docs 200/300 are rank 1 in one
    val a = Seq((1L, 100L, 1L), (1L, 200L, 2L)).toDF("query_id", "doc_id", "rnk")
    val b = Seq((1L, 100L, 1L), (1L, 300L, 2L)).toDF("query_id", "doc_id", "rnk")
    val f = Pipeline.rrfFuse(Seq(a, b), k = 5)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(f.map(_._2).toSeq == Seq(100L, 200L, 300L), s"fusion order wrong: ${f.toSeq}")
    assert(f(0)._3 == 2 * (1000000L / 61) && f(0)._4 == 2L)
    assert(f(1)._3 == 1000000L / 62 && f(1)._4 == 1L)
    // 200 before 300 only via the doc-id tiebreak (equal rrf)
    assert(f(1)._3 == f(2)._3)
  }

  test("vocabDrift: a planted new term tops rising, a vanished term tops falling") {
    import graft.operators.Pipeline
    import spark.implicits._
    val before = (Seq.fill(30)("common words here") ++ Seq.fill(15)("vanishing term corpus"))
      .zipWithIndex.map(_.swap).toDF("id", "text")
    val after = (Seq.fill(30)("common words here") ++ Seq.fill(15)("emerging term corpus"))
      .zipWithIndex.map(_.swap).toDF("id", "text")
    val got = Pipeline.vocabDrift(before, after, "text", topK = 3, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val rising = got.filter(_._5 == "rising").sortBy(-_._4)
    val falling = got.filter(_._5 == "falling").sortBy(_._4)
    assert(rising.head._1 == "emerging", s"rising top: ${rising.toSeq}")
    assert(rising.head._2 == 0L && rising.head._3 == 15L)
    assert(falling.head._1 == "vanishing", s"falling top: ${falling.toSeq}")
    assert(falling.head._2 == 15L && falling.head._3 == 0L)
    // stable terms sit near zero drift relative to the movers
    val common = got.find(_._1 == "common")
    common.foreach(c => assert(math.abs(c._4) < rising.head._4 && math.abs(c._4) < -falling.head._4))
  }

  test("decontaminateRetrieval: vocabulary-sharing paraphrase dropped, unrelated doc survives") {
    import spark.implicits._
    val train = Seq(
      (1L, "quantum entanglement superposition qubits decoherence measurement collapse"),
      (2L, "totally unrelated cooking recipe with butter flour sugar eggs"),
      (3L, "filler filler filler filler filler filler")).toDF("doc_id", "text")
    val evalDocs = Seq(
      (100L, "explain quantum entanglement and superposition of qubits measurement"))
      .toDF("doc_id", "text")
    val kept = Pipeline.decontaminateRetrieval(
        train, evalDocs, "doc_id", "text", "doc_id", "text", minScore = 500L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L), "the vocabulary-sharing doc must be flagged and dropped")
    assert(kept.contains(2L) && kept.contains(3L), s"unrelated docs must survive: $kept")
  }

  test("temperatureMixture: sqrt flattening raises small-domain rates above token share") {
    import spark.implicits._
    val df = (Seq.fill(90)(("big", 100L)) ++ Seq.fill(10)(("small", 100L)))
      .zipWithIndex.map { case ((d, t), i) => (i.toLong, d, t) }
      .toDF("id", "domain", "tok")
    val got = Pipeline.temperatureMixture(df, "domain", col("tok"))
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (bigTok, _, bigRate) = got("big")
    val (smallTok, _, smallRate) = got("small")
    val scale = 1L << 20
    // token share of small = 10%; sqrt temperature lifts its sampling rate
    assert(smallRate.toDouble / scale > smallTok.toDouble / (bigTok + smallTok),
      s"small domain rate ${smallRate.toDouble / scale} not lifted above share")
    // rates renormalize to ~1 (integer floor slack < number of domains)
    assert(bigRate + smallRate <= scale && bigRate + smallRate >= scale - 2)
    // alpha=1/2 exact check: rates proportional to sqrt of token mass
    val expect = math.sqrt(9.0) // sqrt(9000/1000)
    val ratio = bigRate.toDouble / smallRate
    assert(math.abs(ratio - expect) < 0.01, s"ratio $ratio != sqrt(9)")
  }

  test("c4LineClean: each rule fires; document floor enforced") {
    import spark.implicits._
    val page = Seq(
      "Header menu login signup",                       // no terminal punct -> drop
      "This sentence has enough words to survive.",     // keep
      "function() { var x = 1; }",                      // '{' -> drop
      "A perfectly fine second content line here!",     // keep
      "Enable JavaScript to view this page.",           // 'javascript' -> drop
      "Lorem ipsum dolor sit amet consectetur.",        // 'lorem ipsum' -> drop
      "Too short.",                                     // < 5 words -> drop
      "  Trimmed line with trailing spaces counts fine?  ", // keep (space trim)
      "Quoted ending also counts as terminal.\"").mkString("\n")
    val out = graft.operators.Pipeline.c4LineClean(
      Seq((1L, page), (2L, "one good line that ends properly.")).toDF("doc_id", "text"),
      "doc_id", "text")
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L,
      "doc 2 has only one kept line — under the 3-line floor")
    assert(rows.head.getLong(1) == 4L, s"expected 4 kept lines, got ${rows.head.getLong(1)}")
    val kept = rows.head.getString(2).split("\n").toSeq
    assert(kept.head.startsWith("This sentence") &&
      kept(1).startsWith("A perfectly") &&
      kept(2).contains("Trimmed line") &&
      kept(3).startsWith("Quoted ending"),
      s"wrong kept lines: $kept")
  }

  test("q173 publish provenance: decon-before-dedup ordering is load-bearing, " +
      "priority and election classes land as planted") {
    // drive the shipped catalog query (decon first, dedup among CLEAN
    // docs) and assert the three planted classes (see the q173 scaladoc)
    graft.SparkEntry.queries.size: Unit
    val rows = graft.SparkEntry.queries("q173_corpus_publish_provenance")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byId = rows.map(r => r._1 -> r).toMap
    // priority: every +1M mirror carries a benchmark 6-gram by
    // construction -> 'contaminated' with rep -1, even though each is
    // also a >=0.8 near-dup of its base (removal reason priority)
    val mirrors = rows.filter(r => r._1 >= 1000000L && r._1 < 2000000L)
    assert(mirrors.nonEmpty)
    assert(mirrors.forall(r => r._2 == "contaminated" && r._3 == -1L),
      s"mirror misclassified: ${mirrors.filter(_._2 != "contaminated").take(3)}")
    // ordering: a clean base whose ONLY near-dup partner is its
    // contaminated mirror must be KEPT — dedup over the full universe
    // would suppress it (probed: 34 such docs at sf0.001). Bases of
    // mirrors that are clean and natural-pair-free end 'kept':
    val keptMirrorBases = mirrors.map(_._1 - 1000000L).count { b =>
      byId.get(b).exists(r => r._2 == "kept" && r._3 == b)
    }
    assert(keptMirrorBases >= 30,
      s"only $keptMirrorBases mirror bases kept — the decon-before-dedup " +
        "ordering is not being honored")
    // election: +2M exact copies form clean dup clusters; equal quality
    // ties elect the smaller id, so copies read 'dup' pointing at a
    // smaller keeper (their base, unless a larger natural partner wins)
    val copies = rows.filter(_._1 >= 2000000L)
    assert(copies.nonEmpty)
    copies.foreach { c =>
      assert(c._2 == "dup" || c._2 == "contaminated",
        s"exact copy ${c._1} cannot be 'kept' against its smaller-id base: $c")
      if (c._2 == "dup") assert(c._3 < c._1, s"dup keeper must be elected, got $c")
    }
    assert(copies.exists(c => c._2 == "dup" && c._3 == c._1 - 2000000L),
      "at least one copy must elect its own base as keeper")
    // partition: every universe doc is exactly one of the three statuses
    assert(rows.map(_._2).toSet.subsetOf(Set("kept", "dup", "contaminated")))
  }
}
