package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  test("minhash LSH pairs == brute-force jaccard pairs at threshold 0.8") {
    val docs = Tables.load(spark, dir, "documents")
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 3, 128, 32, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: all-pairs (single block) exact jaccard on the same shingles
    val brute = Dedup.ngramJaccardBlocked(
      docs.withColumn("blk", lit(1)), "doc_id", "text", "blk", 3, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute, s"LSH missed ${brute -- lsh}, extra ${lsh -- brute}")
    assert(brute.nonEmpty, "test data should contain planted near-dups")
  }

  test("prefix-filtered jaccard join == direct pairwise at multiple thresholds") {
    import graft.functions.{shingle_hashes, sorted_intersect_count}
    val docs = Tables.load(spark, dir, "documents")
    val sh = docs.select(col("lang").as("blk"), col("doc_id"),
      shingle_hashes(col("text"), 2).as("sh"))
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val got = Dedup.ngramJaccardBlocked(docs, "doc_id", "text", "lang", 2, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val brute = sh.as("x").join(sh.as("y"),
          col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id"),
          (sorted_intersect_count(col("x.sh"), col("y.sh")).cast("double") /
            (size(col("x.sh")) + size(col("y.sh")) -
              sorted_intersect_count(col("x.sh"), col("y.sh"))).cast("double")).as("j"))
        .filter(col("j") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == brute,
        s"t=$t: missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    }
  }

  test("connected components: chains, stars, and disjoint pairs resolve to min-id reps") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), star 10-{11,12,13}, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (10L, 13L), (20L, 21L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L)
    assert(got == want, s"got $got")
    // the distributed min-label loop (forced by maxLocalEdges = 0) must
    // produce identical labels to the driver union-find fast path
    val looped = Dedup.connectedComponents(pairs, maxLocalEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(looped == want, s"distributed loop diverged: $looped")
  }

  test("dropNearDuplicates keeps exactly the cluster representatives") {
    val docs = Tables.load(spark, dir, "documents")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", 3, 128, 32, 0.8)
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val expectDropped = cc.collect { case (v, rep) if v != rep => v }.toSet
    assert(expectDropped.nonEmpty, "test data should contain near-dup clusters")
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.intersect(expectDropped).isEmpty, "dropped docs must not survive")
    assert(kept.size == docs.count() - expectDropped.size, "only duplicates are dropped")
  }

  test("exact dedup keeps lowest id per duplicate group") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "a")).toDF("id", "t")
    val kept = Dedup.exact(df, "id", Seq("t")).select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("ANN query-batch contract: oversized query side fails loudly, naming the contract") {
    val emb = Tables.load(spark, dir, "embeddings")
    val big = spark.range(Similarity.MaxQueryBatch + 1)
      .select(col("id").as("vec_id"), array_repeat(lit(0.5), 4).as("embedding"))
    val e1 = intercept[IllegalArgumentException] {
      Similarity.lshTopK(big, emb, "vec_id", "embedding", "vec_id", "embedding", 3)
    }
    assert(e1.getMessage.contains("broadcast-sized query batch"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(big, emb, "vec_id", "embedding", "vec_id", "embedding", 3)
    }
    assert(e2.getMessage.contains("broadcast-sized query batch"))
  }

  test("charNgramPairs skew guard: hot block diverts to the prefix path — same pairs, pruned candidates") {
    import spark.implicits._
    // adversarial hot block: 300 mutually-dissimilar docs under ONE block
    // key (the block-key-collision hazard: same source×lang×length bucket,
    // unrelated content), plus one planted identical pair and a healthy
    // small block
    def txt(i: Int): String = {
      val sb = new StringBuilder
      var z = i.toLong * 0x9E3779B97F4A7C15L + 12345
      (0 until 60).foreach { _ =>
        z = z * 6364136223846793005L + 1442695040888963407L
        sb.append(('a' + ((z >>> 33) % 26)).toChar)
      }
      sb.toString
    }
    val B = 300
    val hot = (0 until B).map(i => (i.toLong, txt(i), "hot")) ++
      Seq((1000L, txt(7), "hot")) // identical to doc 7 -> the one true pair
    val cool = Seq((2000L, "the quick brown fox jumps", "cool"),
      (2001L, "the quick brown fox jumped", "cool"))
    val df = (hot ++ cool).toDF("doc_id", "text", "blk")
    def pairs(maxBlockRows: Int): Set[(Long, Long, Double)] =
      Dedup.charNgramPairs(df, "doc_id", "text", "blk", 5, 0.5, maxBlockRows)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val guarded = pairs(100) // hot block (301 rows) > cap -> prefix path
    val allPairs = pairs(Int.MaxValue) // everything through the b² path
    assert(guarded == allPairs,
      s"guarded path diverged: missing ${allPairs -- guarded}, extra ${guarded -- allPairs}")
    assert(guarded.exists { case (a, b, j) => a == 7L && b == 1000L && j == 1.0 },
      "planted identical pair must survive the diverted path")
    // the point of the guard: candidate generation on the hot block is
    // inverted-index-pruned, nowhere near the b(b-1)/2 all-pairs blowup
    import graft.functions.char_shingles
    val sh = df.filter(col("blk") === "hot")
      .select(col("blk"), col("doc_id").cast("long").as("doc_id"),
        sort_array(transform(char_shingles(col("text"), 5), g => xxhash64(g))).as("sh"))
      .withColumn("n", size(col("sh")))
    val nCand = Dedup.prefixCandidates(sh, 0.5).count()
    val allPairsCount = (B + 1).toLong * B / 2
    assert(nCand < allPairsCount / 10,
      s"prefix path generated $nCand candidates — not meaningfully below all-pairs $allPairsCount")
  }

  test("charNgramPairs: hashed+ratio-pruned path == naive string jaccard") {
    import graft.functions.char_shingles
    val docs = Tables.load(spark, dir, "documents")
    for (t <- Seq(0.5, 0.7)) {
      val got = Dedup.charNgramPairs(docs, "doc_id", "text", "lang", 5, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // naive specification: string-array intersection, no pruning
      val sh = docs.select(col("lang").as("blk"), col("doc_id").cast("long").as("doc_id"),
        char_shingles(col("text"), 5).as("sh"))
      val brute = sh.as("x").join(sh.as("y"),
          col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id"))
        .withColumn("inter", size(array_intersect(col("x.sh"), col("y.sh"))))
        .withColumn("j", col("inter").cast("double") /
          (size(col("x.sh")) + size(col("y.sh")) - col("inter")).cast("double"))
        .filter(col("j") >= t)
        .select(col("x.doc_id"), col("y.doc_id"), col("j"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == brute,
        s"t=$t: missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
      if (t == 0.5) assert(brute.nonEmpty, "test data should contain char-gram near-dups")
    }
  }

  test("semanticDedupPairs == global cosine pairs restricted to shared clusters") {
    val emb = Tables.load(spark, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
    val got = Similarity.semanticDedupPairs(
      emb, "vec_id", "embedding", cents, "vec_id", "embedding", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cluster = Similarity.assignToCentroids(emb, cents,
      "vec_id", "embedding", "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Similarity.cosinePairsBlocked(
      emb.withColumn("one", lit(1)), "vec_id", "embedding", "one", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => cluster(a) == cluster(b) }.toSet
    assert(got == expect,
      s"missed=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    assert(got.nonEmpty, "test data should contain within-cluster near-dups")
  }

  test("simhash: identical docs collide, near-dups within hamming 3") {
    val docs = Tables.load(spark, dir, "documents")
    val sig = Dedup.simhashSignatures(docs, "doc_id", "text", 2)
    // exact duplicates of shingle sets must produce identical signatures:
    // take the minhash-verified jaccard=1.0 pairs and check hamming == 0
    val exactPairs = Dedup.minhashLsh(docs, "doc_id", "text", 2, 64, 16, 1.0)
      .select("doc_a", "doc_b")
    val joined = exactPairs
      .join(sig.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("simhash", "sa"), "doc_a")
      .join(sig.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("simhash", "sb"), "doc_b")
      .select(bit_count(col("sa").bitwiseXOR(col("sb"))).as("d"))
      .collect().map(_.getInt(0))
    assert(joined.nonEmpty && joined.forall(_ == 0),
      s"jaccard-1.0 pairs must simhash-collide, distances: ${joined.toSeq}")
  }

  test("brute-force cosine top-k matches local computation") {
    val emb = Tables.load(spark, dir, "embeddings")
    val local = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = emb.filter(col("vec_id") < 5)
    val got = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding",
      "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    (0L until 5L).foreach { q =>
      val expect = local.toSeq.filter(_._1 != q)
        .map { case (id, v) => id -> cos(local(q), v) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
      val ours = (1 to 3).map(r => got((q, r)))
      assert(ours == expect, s"query $q: $ours vs $expect")
    }
  }

  test("codegen SeqDot is bit-identical to the HOF fold specification") {
    import graft.functions.{dotd, dotd_hof, vec_double}
    val emb = Tables.load(spark, dir, "embeddings")
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < 20 && col("b.vec_id") < 20)
      .select(vec_double(col("a.embedding")).as("x"), vec_double(col("b.embedding")).as("y"))
    val diffs = pairs
      .select((dotd(col("x"), col("y")) =!= dotd_hof(col("x"), col("y"))).as("d"))
      .filter(col("d")).count()
    assert(diffs == 0, s"$diffs pairs diverge from the HOF specification")
  }

  test("LshBuckets expression == driver-side plane math, bit for bit") {
    // the corpus buckets (codegen'd LshBuckets) and the query probes
    // (driver folds in lshTopK) MUST agree on every sign — a divergence
    // would silently exclude the query's own bucket from its probe set
    import graft.functions.{lsh_buckets, vec_double, LshBuckets}
    val (tables, planes, dim) = (7, 11, 64)
    val thresholds = (0 until tables * planes).map(_ * 0.001 - 0.03)
    val emb = Tables.load(spark, dir, "embeddings").limit(200)
    val got = emb.select(col("vec_id"),
        lsh_buckets(vec_double(col("embedding")), tables, planes, dim, thresholds).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val local = emb.select(col("vec_id"), vec_double(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got.size == local.size && got.nonEmpty)
    local.foreach { case (id, v) =>
      val expect = (0 until tables).map { t =>
        var bucket = 0L
        (0 until planes).foreach { p =>
          val g = t * planes + p
          val h = LshBuckets.planeComponent(g, dim)
          var s = 0.0
          var i = 0
          val n = math.min(v.length, h.length)
          while (i < n) { s += v(i) * h(i); i += 1 }
          if (s >= thresholds(g)) bucket |= (1L << p)
        }
        bucket
      }
      assert(got(id) == expect, s"vec $id: expression buckets diverge from driver math")
    }
  }

  test("LSH ANN recall vs brute force is usable (scale path)") {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val k = 10
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding",
      "vec_id", "embedding", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def meanRecall(ann: Map[Long, Set[Long]]): Double = {
      val rs = brute.keys.toSeq.map { q =>
        ann.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / k
      }
      rs.sum / rs.size
    }
    val lsh = Similarity.lshTopK(queries, emb, "vec_id", "embedding",
      "vec_id", "embedding", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val lshR = meanRecall(lsh)
    assert(lshR >= 0.8, f"mean LSH recall $lshR%.2f below the 0.8 bar")
    // margin-directed multi-probe must hold the recall on a BOUNDED scan:
    // candidate pairs / (queries x corpus) <= 25%
    val scanFrac = Similarity.lshCandidateCount(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding").toDouble /
      (brute.size.toDouble * emb.count())
    assert(scanFrac <= 0.25, f"LSH scan fraction $scanFrac%.2f exceeds 25%%")
    info(f"mean LSH@$k recall: $lshR%.2f at scan fraction $scanFrac%.2f " +
      "(192 tables x 14 planes, margin-directed 4-bit multi-probe)")

    val ivf = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
      "vec_id", "embedding", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivfR = meanRecall(ivf)
    assert(ivfR >= 0.45, f"mean IVF recall $ivfR%.2f too low for a usable ANN path")
    info(f"mean IVF@$k recall: $ivfR%.2f (nprobe/nlist = 32/128 -> ~25%% corpus scanned)")

    // the replicate knob buys recall with list storage, not query fan-out
    val ivf2 = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
      "vec_id", "embedding", k, replicate = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf2R = meanRecall(ivf2)
    // never-worse, not strictly-better: the auto-nlist default can put
    // the replicate=1 baseline AT the 1.0 ceiling on this corpus
    assert(ivf2R >= ivfR, f"replicate=2 lost recall ($ivf2R%.2f vs $ivfR%.2f)")
    info(f"mean IVF@$k recall at replicate=2: $ivf2R%.2f (~50%% corpus scanned)")
  }

  test("assignToCentroids: argmax-cosine reference, centroids self-assign at cos 1.0") {
    val emb = Tables.load(spark, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
    val got = Similarity.assignToCentroids(emb, cents,
      "vec_id", "embedding", "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size == emb.count())
    // reference argmax via brute-force scoring
    val ref = Similarity.bruteForceTopK(cents, emb, "vec_id", "embedding",
      "vec_id", "embedding", k = emb.count().toInt)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.maxBy(t => (t._3, -t._2))).toMap
    // centroid vectors assign to themselves with exactly cos 1.0
    (0L until 8L).foreach { cid =>
      assert(got(cid)._1 == cid, s"centroid $cid must self-assign: ${got(cid)}")
      assert(got(cid)._2 == 1.0, s"self-similarity must be exactly 1.0: ${got(cid)}")
    }
    // non-centroid vectors match the brute-force argmax (brute force excludes
    // self pairs, so compare only ids >= 8; cos formulas differ by <=1 ulp)
    got.filterKeys(_ >= 8).foreach { case (vid, (cid, cos)) =>
      val (_, refCid, refCos) = ref(vid)
      assert(cid == refCid, s"vec $vid: got centroid $cid, want $refCid")
      assert(math.abs(cos - refCos) < 1e-12)
    }
  }

  test("persisted IVF index: bit-identical to the inline path, probe prunes partitions") {
    val emb = Tables.load(spark, dir, "embeddings")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-ivf-spec"
    Similarity.buildIvfIndex(emb, path, "vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 50)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getInt(3))).toSet
    val inline = rows(Similarity.ivfTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5))
    val served = Similarity.ivfTopKFromIndex(path, queries,
      "vec_id", "embedding", k = 5)
    assert(rows(served) === inline,
      "index-served results must be bit-identical to the inline path")

    // a replicate=2 index must dedup multi-list pairs WITHOUT the caller
    // knowing how it was built (replicate rides in the index meta)
    val path2 = s"${System.getProperty("java.io.tmpdir")}/graft-ivf-spec-r2"
    Similarity.buildIvfIndex(emb, path2, "vec_id", "embedding", replicate = 2)
    val inline2 = rows(Similarity.ivfTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, replicate = 2))
    val served2 = Similarity.ivfTopKFromIndex(path2, queries,
      "vec_id", "embedding", k = 5)
    assert(rows(served2) === inline2,
      "replicate=2 index must serve deduped, bit-identical results")
    val perQuery = served2.collect().groupBy(_.getLong(0))
    perQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).distinct.length === rs.length,
        s"query $q: duplicate neighbor across ranks")
    }

    // one query probing nprobe=4 of the default-nlist lists: the parquet
    // scan must select at most 4 bucket partitions (IVF pruning =
    // partition pruning)
    val one = Similarity.ivfTopKFromIndex(path,
      emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 5, nprobe = 4)
    one.count() // materialize so AQE resolves the final plan
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
    val listScan = scans(one.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("graft-ivf-spec")))
    assert(listScan.nonEmpty, "expected a parquet scan over the index lists")
    val selected = listScan.map(_.selectedPartitions.partitionCount).max
    assert(selected <= 4,
      s"single-query probe must read <= nprobe=4 list partitions, read $selected")
  }

  test("appendToIvfIndex: delta assigned with the persisted codebook, served uniformly") {
    def rm(p: String): Unit = {
      def go(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(go)); f.delete(): Unit
      }
      go(new java.io.File(p))
    }
    val emb = Tables.load(spark, dir, "embeddings")
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-ivf-append-spec"
    rm(path)
    Similarity.buildIvfIndex(even, path, "vec_id", "embedding")
    Similarity.appendToIvfIndex(odd, path, "vec_id", "embedding")
    // every appended vector landed in exactly replicate(=1) lists
    def listsOf(p: String) =
      spark.read.parquet(s"${Similarity.ivfCurrent(spark, p)}/lists")
    assert(listsOf(path).count() == emb.count())
    val queries = emb.filter(col("vec_id") < 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getInt(3))).toSet
    val served = rows(Similarity.ivfTopKFromIndex(path, queries, "vec_id", "embedding", k = 10))
    // appended (odd) vectors must be reachable: the served results contain
    // odd neighbors, and overall recall vs FULL-corpus brute force holds
    assert(served.exists(_._2 % 2 == 1), "no appended vector ever served")
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding",
      "vec_id", "embedding", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ann = served.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val recall = brute.keys.toSeq.map { q =>
      ann.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / 10
    }.sum / brute.size
    assert(recall >= 0.4, f"appended-index recall $recall%.2f below floor")
    // deterministic: a fresh build+append serves byte-identical results
    val path2 = path + "-2"
    rm(path2)
    Similarity.buildIvfIndex(even, path2, "vec_id", "embedding")
    Similarity.appendToIvfIndex(odd, path2, "vec_id", "embedding")
    val served2 = rows(Similarity.ivfTopKFromIndex(path2, queries, "vec_id", "embedding", k = 10))
    assert(served == served2, "append path must be deterministic")
    rm(path); rm(path2)
  }

  test("appendToIvfIndex: retries are idempotent, staging never leaks to readers") {
    def rm(p: String): Unit = {
      def go(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(go)); f.delete(): Unit
      }
      go(new java.io.File(p))
    }
    val emb = Tables.load(spark, dir, "embeddings")
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-ivf-retry-spec"
    rm(path)
    Similarity.buildIvfIndex(even, path, "vec_id", "embedding")
    // a re-run with the SAME batchId replaces its own files — no duplicates
    Similarity.appendToIvfIndex(odd, path, "vec_id", "embedding", batchId = "b1")
    Similarity.appendToIvfIndex(odd, path, "vec_id", "embedding", batchId = "b1")
    val cur = Similarity.ivfCurrent(spark, path)
    assert(spark.read.parquet(s"$cur/lists").count() == emb.count(),
      "same-batchId retry must not duplicate delta vectors")
    // no staging residue: readers of the lists never see stage dirs
    val residue = Option(new java.io.File(cur).listFiles()).get
      .map(_.getName).filter(_.contains(".stage"))
    assert(residue.isEmpty, s"staging residue left behind: ${residue.toSeq}")
    // a DIFFERENT batchId is a new delta (appends again)
    Similarity.appendToIvfIndex(odd, path, "vec_id", "embedding", batchId = "b2")
    assert(spark.read.parquet(s"$cur/lists").count() ==
      even.count() + 2 * odd.count())
    rm(path)
  }

  test("IvfNearestLists: NaN vector degrades to a valid list set, no crash") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val nlist = 4; val dim = 3
    val mat = Array.tabulate(nlist * dim)(i => (i % 7).toDouble / 7.0)
    val nanVec = ArrayData.toArrayData(Array(Double.NaN, 1.0, 2.0))
    val out = graft.functions.IvfNearestLists
      .compute(nanVec, mat, nlist, dim, take = 2)
    val lists = out.toIntArray().toSeq
    assert(lists.length == 2 && lists.distinct.length == 2 &&
      lists.forall(j => j >= 0 && j < nlist),
      s"NaN vector must yield `take` distinct valid lists, got $lists")
  }

  test("prototypeSimilarityMatrix: string labels keep their type and order") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f))).toDF("vec_id", "v")
    val lbl = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "de")).toDF("vec_id", "lang")
    val out = Similarity.prototypeSimilarityMatrix(vecs, lbl, "vec_id", "v", "lang")
      .collect()
    assert(out.length === 1)
    assert((out.head.getString(0), out.head.getString(1)) === ("de", "en"))
    val cos = out.head.getDouble(2)
    assert(cos > 0 && cos < 0.5, s"orthogonal-ish prototypes, got $cos")
  }

  test("prototypeSimilarityMatrix: bit-identical to a driver-side ordered fold") {
    val emb = Tables.load(spark, dir, "embeddings")
    val got = Similarity.prototypeSimilarityMatrix(
      emb, emb.select(col("vec_id"), col("label")), "vec_id", "embedding", "label")
      .collect().map(r => ((r.getInt(0).toLong, r.getInt(1).toLong), r.getDouble(2))).toMap
    // driver reference: means fold member values in vec_id order per dim;
    // dot/norms fold in dim order — the exact arithmetic the op promises
    val raw = emb.select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val dim = raw.head._2.length
    val means: Map[Long, Array[Double]] = raw.groupBy(_._3.toLong).map { case (lbl, rs) =>
      val sorted = rs.sortBy(_._1)
      lbl -> Array.tabulate(dim) { d =>
        var s = 0.0; sorted.foreach(s += _._2(d)); s / sorted.length
      }
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += a(i) * b(i); i += 1 }
      s
    }
    val labels = means.keys.toSeq.sorted
    val want = (for {
      i <- labels; j <- labels if i < j
    } yield (i, j) -> dot(means(i), means(j)) /
      (math.sqrt(dot(means(i), means(i))) * math.sqrt(dot(means(j), means(j))))).toMap
    assert(got.keySet === want.keySet)
    assert(got.size === labels.size * (labels.size - 1) / 2)
    got.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ===
        java.lang.Double.doubleToLongBits(want(k)),
        s"pair $k: $v != ${want(k)} (must match to the bit)")
    }
  }

  test("charNgramPairs DENSE hot block: density dispatch routes to triangle — same pairs") {
    import spark.implicits._
    // dense near-dup set: every doc is the base text with one word swapped —
    // every pair is a true near-dup, so prefix filtering can prune nothing
    // and the triangle path must win (and must return IDENTICAL pairs)
    def perturbed(i: Int): String =
      (0 until 30).map(j => if (j == i % 30) s"odd$i" else s"tok$j").mkString(" ")
    val B = 300
    val dense = (0 until B).map(i => (i.toLong, perturbed(i), "dense"))
    val cool = Seq((9000L, "the quick brown fox jumps", "cool"),
      (9001L, "the quick brown fox jumped", "cool"))
    val df = (dense ++ cool).toDF("doc_id", "text", "blk")
    def pairs(maxBlockRows: Int): Set[(Long, Long, Double)] =
      Dedup.charNgramPairs(df, "doc_id", "text", "blk", 5, 0.5, maxBlockRows)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val guarded = pairs(100) // dense block (300 rows) > cap -> probe -> triangle
    val allPairs = pairs(Int.MaxValue) // everything through the b² join path
    assert(guarded == allPairs,
      s"triangle path diverged: missing ${(allPairs -- guarded).take(5)}, " +
        s"extra ${(guarded -- allPairs).take(5)}")
    assert(allPairs.count { case (a, b, _) => a < 9000 && b < 9000 } > B,
      "dense block should produce > B near-dup pairs")
    // the dispatch itself: this block measures dense, the sparse spec's
    // collision block measures sparse
    import graft.functions.char_shingles
    val sh = df.filter(col("blk") === "dense")
      .select(col("blk"), col("doc_id").cast("long").as("doc_id"),
        sort_array(transform(char_shingles(col("text"), 5), g => xxhash64(g))).as("sh"))
      .withColumn("n", size(col("sh")))
    assert(Dedup.blockDensity(sh, B.toLong, 0.5) >= Dedup.DenseDispatchDensity,
      "dense block must measure above the dispatch density")
    // triangle output is exact at any chunking (s follows b; force the
    // multi-chunk regime by lying about b upward)
    val expected = allPairs.filter { case (a, b, _) => a < 9000 && b < 9000 }
    for (bClaim <- Seq(B.toLong, 100000L)) {
      val tri = Dedup.triangleBlockPairs(sh, 0.5, bClaim)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(tri == expected, s"triangle(b=$bClaim) diverged")
    }
  }

  test("charNgramPairs: null block key semantics survive the dense dispatch") {
    import spark.implicits._
    // one DENSE named hot block + one DENSE null-keyed hot block. A null
    // block key never pairs in the declarative formulation (x.blk ===
    // y.blk is never true for nulls), so the dispatch must NOT route the
    // null block to the triangle path — that would invent pairs the
    // unguarded path cannot emit. Guarded and unguarded must agree:
    // named-block pairs present, null-block pairs absent in BOTH.
    def perturbed(i: Int): String =
      (0 until 30).map(j => if (j == i % 30) s"odd$i" else s"tok$j").mkString(" ")
    val dense = (0 until 150).map(i => (i.toLong, perturbed(i), "dense"))
    val nullBlk = (0 until 150).map(i => (1000L + i, perturbed(i), null: String))
    val df = (dense ++ nullBlk).toDF("doc_id", "text", "blk")
    def pairs(maxBlockRows: Int): Set[(Long, Long)] =
      Dedup.charNgramPairs(df, "doc_id", "text", "blk", 5, 0.5, maxBlockRows)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val guarded = pairs(100)
    val unguarded = pairs(Int.MaxValue)
    assert(guarded == unguarded,
      s"paths diverged: missing ${(unguarded -- guarded).take(5)}, " +
        s"extra ${(guarded -- unguarded).take(5)}")
    assert(guarded.exists { case (a, b) => a < 1000 && b < 1000 },
      "the named dense block's pairs must survive the dispatch")
    assert(!guarded.exists { case (a, b) => a >= 1000 || b >= 1000 },
      "null-keyed rows must not pair (join-equality semantics)")
  }

  test("IVF-PQ index: m-byte codes, deterministic rebuild, exact rerank, pruned probe") {
    val emb = Tables.load(spark, dir, "embeddings")
    val tmp = System.getProperty("java.io.tmpdir")
    val path = s"$tmp/graft-pq-spec"
    Similarity.buildIvfPqIndex(emb, path, "vec_id", "embedding")
    // compression is structural: every vector is EXACTLY m=16 code bytes
    val lists = spark.read.parquet(s"$path/lists")
    val widths = lists.agg(min(octet_length(col("codes"))),
      max(octet_length(col("codes")))).head()
    assert(widths.getInt(0) == 16 && widths.getInt(1) == 16,
      s"codes must be exactly 16 bytes, got $widths")
    assert(lists.count() == emb.count(), "every corpus vector must be indexed")
    // deterministic end-to-end: a rebuild produces byte-identical codes
    val path2 = s"$tmp/graft-pq-spec-rebuild"
    Similarity.buildIvfPqIndex(emb, path2, "vec_id", "embedding")
    def codes(p: String): Map[Long, Seq[Byte]] =
      spark.read.parquet(s"$p/lists").collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("codes").toSeq).toMap
    assert(codes(path) == codes(path2), "rebuild must be byte-identical")

    val queries = emb.filter(col("vec_id") < 50)
    val brute = Similarity.bruteForceTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        java.lang.Double.doubleToLongBits(r.getDouble(2))).toMap
    // ADC + exact-rerank serve: recall floor, and every returned pair's
    // cosine must be BIT-IDENTICAL to the brute-force formula (the rerank
    // is exact — only the candidate set is approximate)
    val ann = Similarity.ivfPqTopK(path, queries, "vec_id", "embedding",
      k = 5, nprobe = 32, rerank = 40,
      exact = emb, exactId = "vec_id", exactVec = "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        java.lang.Double.doubleToLongBits(r.getDouble(2))).toMap
    val hits = ann.keySet.count(brute.contains)
    assert(hits.toDouble / brute.size >= 0.9,
      s"recall@5 ${hits.toDouble / brute.size} below floor (all lists probed here)")
    ann.foreach { case (pair, cosBits) =>
      brute.get(pair).foreach(bb =>
        assert(bb == cosBits, s"rerank cos for $pair must bit-match brute force"))
    }
    // ADC-only path still ranks: no rerank, scores are approximations but
    // the serve path must not need the original vectors
    val adcOnly = Similarity.ivfPqTopK(path, queries, "vec_id", "embedding",
      k = 5, nprobe = 32)
    assert(adcOnly.count() == queries.count() * 5)

    // IVF pruning = partition pruning: a single-query nprobe=4 probe must
    // read at most 4 bucket=N partitions of the lists parquet
    val one = Similarity.ivfPqTopK(path,
      emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 5, nprobe = 4)
    one.count()
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
    val listScan = scans(one.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("graft-pq-spec")))
    assert(listScan.nonEmpty, "expected a parquet scan over the PQ lists")
    val selected = listScan.map(_.selectedPartitions.partitionCount).max
    assert(selected <= 4,
      s"single-query probe must read <= nprobe=4 list partitions, read $selected")
  }

  test("PQ ADC score equals the independently computed table sum") {
    import spark.implicits._
    // tiny handmade case: dim=4, m=2, ksub=2 — table entries chosen so the
    // expected ADC sum is exact in doubles
    val tab = Seq(1.5, 2.5, 10.0, 20.0) // [s=0: j0=1.5 j1=2.5][s=1: j0=10 j1=20]
    val rows = Seq(
      (Array[Byte](0, 0), 1.5 + 10.0),
      (Array[Byte](1, 0), 2.5 + 10.0),
      (Array[Byte](0, 1), 1.5 + 20.0),
      (Array[Byte](1, 1), 2.5 + 20.0))
    val df = rows.toDF("codes", "want")
      .withColumn("got", graft.functions.pq_adc(typedLit(tab), col("codes"), 2, 2))
    df.collect().foreach { r =>
      assert(r.getDouble(2) == r.getDouble(1),
        s"ADC sum mismatch: ${r.getDouble(2)} != ${r.getDouble(1)}")
    }
  }

  test("IVF codebook: distributed Lloyd is bit-identical to the driver-threaded path") {
    // embeddings at sf0.001 through the SAME normalized-corpus projection
    // both build paths consume; nlist small enough that both paths are
    // cheap, refine 3 = the production default
    val emb = Tables.load(spark, dir, "embeddings")
    val c = Similarity.normalizedCorpus(emb, "vec_id", "embedding")
    for (nlist <- Seq(8, 32)) {
      val local = Similarity.trainIvfCodebookLocal(c, nlist, 3)
      val dist = Similarity.trainIvfCodebookDistributed(c, nlist, 3)
      assert(local.length == dist.length)
      local.zip(dist).zipWithIndex.foreach { case ((l, d), j) =>
        assert(l == d, s"centroid $j differs between local and distributed Lloyd")
      }
      // bit-exact, not just approximately equal: compare raw long bits
      val lb = local.flatten.map(java.lang.Double.doubleToRawLongBits)
      val db = dist.flatten.map(java.lang.Double.doubleToRawLongBits)
      assert(lb == db, "codebooks must be BIT-identical across execution paths")
    }
  }

  test("charNgramPairCounts == COUNT(*) of charNgramPairs on every dispatch path") {
    val docs = Tables.load(spark, dir, "documents")
    // default guard: the common no-oversized-block plan
    for ((maxBlock, thr) <- Seq((4096, 0.8), (4096, 0.5), (8, 0.8), (8, 0.5), (2, 0.7))) {
      // tiny maxBlockRows forces the hot dispatch: density probe routes
      // blocks to triangle or PPJoin — counts must match in every branch mix
      val pairs = Dedup.charNgramPairs(docs, "doc_id", "text", "lang",
        threshold = thr, maxBlockRows = maxBlock).count()
      val counts = Dedup.charNgramPairCounts(docs, "doc_id", "text", "lang",
        threshold = thr, maxBlockRows = maxBlock).collect()(0).getLong(0)
      assert(counts == pairs, s"maxBlockRows=$maxBlock thr=$thr: counts=$counts pairs=$pairs")
    }
  }

  test("containment pairs == direct pairwise containment at multiple thresholds") {
    import graft.functions.{shingle_hashes, sorted_intersect_count}
    val docs = Tables.load(spark, dir, "documents")
    val sh = docs.select(col("lang").as("blk"), col("doc_id"),
      shingle_hashes(col("text"), 3).as("sh"))
    for (t <- Seq(0.4, 0.6, 0.9)) {
      val got = Dedup.containmentPairs(docs, "doc_id", "text", "lang", 3, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // brute force: DIRECTED all-pairs, containment of a's shingles in b
      val brute = sh.as("x").join(sh.as("y"),
          col("x.blk") === col("y.blk") && col("x.doc_id") =!= col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id"),
          (sorted_intersect_count(col("x.sh"), col("y.sh")).cast("double") /
            size(col("x.sh")).cast("double")).as("c"))
        .filter(col("c") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == brute,
        s"t=$t: missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
      assert(brute.nonEmpty, s"t=$t: corpus should contain containment pairs")
    }
  }

  test("jacobiEig recovers a known rotated spectrum exactly") {
    // diag(3, 1) rotated by 45°: cov = [[2, 1], [1, 2]] → λ = {3, 1},
    // eigenvectors ±(1, 1)/√2 and ±(1, -1)/√2
    val cov = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (lambda, q) = Similarity.jacobiEig(cov)
    assert(math.abs(lambda(0) - 3.0) < 1e-12 && math.abs(lambda(1) - 1.0) < 1e-12,
      s"eigenvalues ${lambda.toSeq}")
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(q(0)(0) * r + q(0)(1) * r) - 1.0) < 1e-12,
      s"top eigenvector ${q(0).toSeq} not aligned with (1,1)/sqrt2")
    assert(math.abs(q(1)(0) * r + q(1)(1) * r) < 1e-12,
      s"second eigenvector ${q(1).toSeq} not orthogonal to (1,1)/sqrt2")
  }

  test("pcaWhitenReport finds the planted dominant axis and whitens it away") {
    import spark.implicits._
    // 400 vectors along (1, 2, 0, 0) + small noise on dims 3/4: the top
    // component must carry almost all variance, and whitening must pass
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { _ =>
      val tV = rnd.nextGaussian() * 10.0
      Array(tV.toFloat, (2.0 * tV).toFloat,
        (rnd.nextGaussian() * 0.1).toFloat, (rnd.nextGaussian() * 0.1).toFloat)
    }
    val df = rows.map(v => Tuple1(v)).toDF("embedding")
    val rpt = Similarity.pcaWhitenReport(df, "embedding", k = 2).collect()(0)
    assert(rpt.getLong(0) == 400 && rpt.getInt(1) == 4 && rpt.getInt(2) == 2)
    (3 to 7).foreach(i => assert(rpt.getBoolean(i), s"invariant $i false: $rpt"))
    // report is stable under repartitioning (invariants, not raw floats)
    val rpt2 = Similarity.pcaWhitenReport(df.repartition(7), "embedding", k = 2)
      .collect()(0)
    assert(rpt2 == rpt, s"repartitioned report differs: $rpt2 vs $rpt")
  }

  test("pcaTopK: rerank cosine bit-equals brute force on every returned pair") {
    val emb = Tables.load(spark, dir, "embeddings")
    val served = Similarity.pcaTopK(emb.filter(col("vec_id") < 20), emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, kDim = 24, candM = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(served.nonEmpty)
    val brute = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 20), emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 500)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    served.foreach { case (pair, cos) =>
      assert(java.lang.Double.doubleToRawLongBits(cos) ==
        java.lang.Double.doubleToRawLongBits(brute(pair)),
        s"rerank cos differs from brute force on $pair")
    }
    // projection shape: kDim-wide arrays, one row per vector
    val proj = Similarity.pcaProject(emb, "vec_id", "embedding", k = 24)
    val row = proj.head()
    assert(row.getSeq[Double](1).length == 24)
    assert(proj.count() == emb.count())
  }

  test("maxsim: kernel == driver fold; token-level match outranks diffuse cosine") {
    import spark.implicits._
    // 4-dim vectors, subDim 2 → two "token" sub-vectors each.
    // q = e1 token + zero token; A carries q's token in the OTHER slot
    // (cosine(q, A) = 0 — single-vector retrieval can't see it);
    // B is diffusely similar (cos ≈ 0.7) but has no strong token match.
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), // query
      (1L, Array(0f, 0f, 1f, 0f)), // A: exact token, wrong position
      (2L, Array(0.5f, 0f, 0.5f, 0f))) // B: diffuse overlap
      .toDF("vec_id", "embedding")
    val served = Similarity.maxSimTopK(rows.filter(col("vec_id") === 0), rows,
      "vec_id", "embedding", "vec_id", "embedding", k = 2, subDim = 2)
      .orderBy(col("rank")).collect()
    assert(served(0).getLong(1) == 1L && served(1).getLong(1) == 2L,
      s"maxsim must rank the token match first: ${served.toSeq}")
    assert(served(0).getDouble(2) == 1.0 && served(1).getDouble(2) == 0.5)
    val cosTop = Similarity.bruteForceTopK(rows.filter(col("vec_id") === 0), rows,
      "vec_id", "embedding", "vec_id", "embedding", k = 1).collect()(0)
    assert(cosTop.getLong(1) == 2L, "cosine must prefer the diffuse doc — " +
      "the case maxsim exists for")

    // kernel == independent driver fold on real embeddings
    val emb = Tables.load(spark, dir, "embeddings").limit(50)
      .select(col("vec_id"), graft.functions.vec_double(col("embedding")).as("v"))
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def fold(q: Array[Double], d: Array[Double], s: Int): Double = {
      (0 until q.length / s).map { i =>
        (0 until d.length / s).map { j =>
          (0 until s).foldLeft(0.0)((a, m) => a + q(i * s + m) * d(j * s + m))
        }.max
      }.sum
    }
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        graft.functions.maxsim_score(col("a.v"), col("b.v"), 8).as("s"))
      .collect()
    pairs.foreach { r =>
      val want = fold(vecs(r.getLong(0)), vecs(r.getLong(1)), 8)
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(want),
        s"kernel diverges from driver fold on (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("mmrSelect: redundancy penalized — the diverse doc outranks a near-clone") {
    import spark.implicits._
    // query = e1; docs 1/2 are near-identical clones tilted +e2 (rel ≈
    // 0.90, sim12 ≈ 1), doc 3 is tilted −e2 (rel ≈ 0.88 — below the
    // clones — but sim13 ≈ 0.59). Plain top-2 takes the two clones; MMR
    // at λ = 0.5 must take one clone then the diverse doc
    // (score(2) ≈ 0.45 − 0.50 < 0 < 0.15 ≈ score(3)).
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0.44f, 0f, 0f)),
      (2L, Array(0.9f, 0.44f, 0.01f, 0f)),
      (3L, Array(0.88f, -0.47f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val sel = Similarity.mmrSelect(rows.filter(col("vec_id") === 0), rows,
      "vec_id", "embedding", "vec_id", "embedding", k = 2, candM = 3)
      .orderBy(col("sel_rank")).collect().map(_.getLong(2))
    assert(sel(0) == 1L, s"first pick must be the most relevant: ${sel.toSeq}")
    assert(sel(1) == 3L, s"second pick must be the DIVERSE doc, not the clone: ${sel.toSeq}")
    val topk = Similarity.bruteForceTopK(rows.filter(col("vec_id") === 0), rows,
      "vec_id", "embedding", "vec_id", "embedding", k = 2)
      .orderBy(col("rank")).collect().map(_.getLong(1))
    assert(topk.toSeq == Seq(1L, 2L), "plain top-2 must take both clones — " +
      "the redundancy MMR exists to avoid")
    // contract: oversized candidate sets are refused loudly
    intercept[IllegalArgumentException] {
      Similarity.mmrSelect(rows, rows, "vec_id", "embedding",
        "vec_id", "embedding", k = 2, candM = 1000)
    }
  }

  test("containment catches the quote-in-container pair jaccard misses") {
    import spark.implicits._
    // doc 1 = a 12-word quote; doc 2 = the same quote inside a 60-word page.
    // Shingle sets: |A| = 10, |B| = 58, |A∩B| = 10 → containment(A→B) = 1.0
    // but jaccard = 10/58 ≈ 0.17 — far below any useful dedup threshold.
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val page = ((1 to 24).map(i => s"w$i") ++ (1 to 12).map(i => s"q$i") ++
      (25 to 48).map(i => s"w$i")).mkString(" ")
    val docs = Seq((1L, quote, "en"), (2L, page, "en"), (3L, "unrelated text here", "en"))
      .toDF("doc_id", "text", "lang")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", "lang", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont == Set((1L, 2L)), s"containment found $cont")
    val jac = Dedup.ngramJaccardBlocked(docs, "doc_id", "text", "lang", 3, 0.5)
      .collect()
    assert(jac.isEmpty, "jaccard at 0.5 must NOT see the asymmetric pair")
  }
}
