package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{ClusterRegistry, Dedup, Media, PhashIndex, Pipeline, RetrievalIndex, Similarity}
import graft.streaming.Sessionize

/** One-line scale/skew stress benchmark over [[StressData]]'s hostile
  * 10×-sf0.1 corpus: each scale-sensitive operator once, wall seconds.
  * The VALUES are pinned by ScaleStressSpec; this line tracks the COST
  * of surviving skew round over round. */
object StressBench {

  /** Fragmented-registry shape: `RegistryEpochs` chained quality-aware
    * epochs of `RegistryPer` docs each — one assign/relabel/elect batch
    * dir per epoch, one [[ClusterRegistry.compact]] mid-way (so the
    * quality sidecar holds FOLDED tombstones AND re-fragmented post-fold
    * dirs, and the second half's batch dirs re-fragment the fresh
    * generation). Epoch k's docs each carry one edge to the previous
    * epoch's doc of the same residue: `RegistryPer` chains, cluster id =
    * the residue, elected rep = the max-quality chain member. */
  val RegistryEpochs = 100
  val RegistryPer = 200

  private val builtReg = new scala.collection.concurrent.TrieMap[String, String]()

  /** Build (once per JVM) the fragmented registry above and return its
    * path — the daily-epoch-cadence pipeline state whose election read
    * ([[ClusterRegistry.assignWithReps]]) the `registry_assign` stress
    * leg times (the r14 sidecar fold fixed WRITE fragmentation; this
    * keeps the READ path honest round over round). */
  def fragmentedRegistry(spark: SparkSession): String =
    builtReg.getOrElseUpdate("reg", {
      import spark.implicits._
      val path = s"${System.getProperty("java.io.tmpdir")}/graft-stressbench-reg-" +
        s"${java.lang.ProcessHandle.current().pid()}"
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.delete(hp, true)
      def qual(ids: Seq[Long]) = ids.map(d => (d, (d % 97).toDouble))
      // epoch-0 docs seed as quality-covered singletons (no pairs yet):
      // every later bridge elects through the sidecar, the r14 device
      ClusterRegistry.seed(spark,
        Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), path,
        Some(qual(0L until RegistryPer.toLong)
          .toDF("doc_id", "quality")))
      for (k <- 1 until RegistryEpochs) {
        val docs = (k.toLong * RegistryPer) until ((k + 1).toLong * RegistryPer)
        ClusterRegistry.register(spark, path, docs,
          docs.map(d => (d, d - RegistryPer)), k.toString,
          qual(docs).toMap)
        if (k == RegistryEpochs / 2) ClusterRegistry.compact(spark, path)
      }
      path
    })

  /** Delete this JVM's stress index trees at exit (registered once):
    * the per-pid dirs otherwise accumulate stress-scale index data in
    * the tmpdir across rounds — the ScratchIvf r16-ADVICE class. Exit-
    * time only, so no timed leg changes. */
  private lazy val tmpdirCleanup: Unit = {
    val pid = java.lang.ProcessHandle.current().pid()
    val tmp = System.getProperty("java.io.tmpdir")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      Seq("ivf", "ph", "bm", "dc", "reg")
        .foreach(k => rm(new java.io.File(s"$tmp/graft-stressbench-$k-$pid")))
    }))
  }

  def line(spark: SparkSession): String = {
    tmpdirCleanup
    val dir = StressData.ensure(spark)
    val docs = Tables.load(spark, dir, "documents")
    // near-dup PAIR ENUMERATION output is quadratic in the duplicate-set
    // size — the 12k slice (full hot block + diverse tail, the
    // ScaleStressSpec shape) keeps the per-round bench minutes-free
    val ngramDocs = docs.filter(col("doc_id") < 12000)
    val emb = Tables.load(spark, dir, "embeddings")
    val events = Tables.load(spark, dir, "events")
    def time(f: => Long): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    val ivfPath = s"${System.getProperty("java.io.tmpdir")}/graft-stressbench-ivf-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    val phashPath = s"${System.getProperty("java.io.tmpdir")}/graft-stressbench-ph-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    def asMedia(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media", Media.asMedia("payload", "image/stub"))
      .select(col("doc_id"), col("media"))
    val ops = Seq(
      "budget" -> time(Pipeline.selectToBudget(docs, "lang", "doc_id",
        col("n_chars").cast("double"), col("n_chars"), 400000L).count()),
      "pack" -> time(Pipeline.packSequences(docs, "doc_id", "text", "lang", 4096).count()),
      "minhash" -> time(Dedup.minhashLsh(ngramDocs, "doc_id", "text", threshold = 0.7).count()),
      // the charngram split attributes the cost: _counts runs the identical
      // dispatch + candidate generation + exact verification but never
      // materializes pair rows, so (charngram − charngram_counts) is the
      // pure pair-EMISSION price of the quadratic output volume
      "charngram_counts" -> time(Dedup.charNgramPairCounts(ngramDocs, "doc_id",
        "text", "lang", threshold = 0.8).collect()(0).getLong(0)),
      "charngram" -> time(Dedup.charNgramPairs(ngramDocs, "doc_id", "text", "lang",
        threshold = 0.8).count()),
      "containment" -> time(Dedup.containmentPairs(ngramDocs, "doc_id", "text",
        "lang", shingleSize = 3, threshold = 0.8).count()),
      "sessions" -> time(Sessionize.sessionsBatchScalable(events, 600000L).count()),
      "ivf_build" -> time {
        Similarity.buildIvfIndex(emb, ivfPath, "vec_id", "embedding"); 0L
      },
      "ivf_probe" -> time(Similarity.ivfTopKFromIndex(ivfPath,
        emb.filter(col("vec_id") < 100), "vec_id", "embedding", k = 10, nprobe = 28).count()),
      // phash index at stress scale: build over the full corpus, serve a
      // 10 %-sized delta whose payloads duplicate base docs (shifted ids)
      // — measures the serve's one corpus-output-sized shuffle (the
      // multi-band pair distinct) the r13 verdict said to measure before
      // touching
      "phash_build" -> time {
        PhashIndex.build(asMedia(docs), "doc_id", "media", phashPath); 0L
      },
      "phash_serve" -> time(PhashIndex.pairsAgainstIndex(
        asMedia(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))),
        "doc_id", "media", phashPath).count()),
      // dedup-map read path against the ~100-epoch fragmented registry
      // (setup untimed — the amortized ingest; the timed leg is what a
      // corpus-publish pays per read)
      "registry_assign" -> {
        val reg = fragmentedRegistry(spark)
        val ids = spark.range(RegistryEpochs.toLong * RegistryPer)
          .select(col("id").as("doc_id"))
        time(ClusterRegistry.assignWithReps(ids, reg).count())
      },
      // benchmark-decon gate at stress scale (the q172 go-forward probe):
      // a 2 % benchmark slice indexed (untimed — the amortized release
      // ingest), the FULL hostile corpus served through the shingle
      // probe. The hot block is the adversarial part: ~24 benchmark docs
      // inside the 1200-doc near-identical block make its shingles
      // corpus-hot, so the explode-join fans out on few keys — absorbed
      // by map-side partial aggregation, never a driver loop
      // BM25 postings index at stress scale: build = the once-per-corpus-
      // version cost over the full hostile corpus (hot-block term skew
      // included — 1200 near-identical docs make their terms corpus-hot,
      // absorbed by the map-side (doc,term) combine); serve = a 100-doc
      // query batch's top-10, the per-audit/per-RAG-batch cost that reads
      // only the query terms' pb partitions
      "bm25_build" -> {
        val rPath = s"${System.getProperty("java.io.tmpdir")}/graft-stressbench-bm-" +
          s"${java.lang.ProcessHandle.current().pid()}"
        time { RetrievalIndex.build(docs, "doc_id", "text", rPath); 0L }
      },
      "bm25_serve" -> {
        val rPath = s"${System.getProperty("java.io.tmpdir")}/graft-stressbench-bm-" +
          s"${java.lang.ProcessHandle.current().pid()}"
        time(RetrievalIndex.topK(docs.filter(col("doc_id") % 500 === 7),
          "doc_id", "text", rPath, k = 10).count())
      },
      "decon_serve" -> {
        val dPath = s"${System.getProperty("java.io.tmpdir")}/graft-stressbench-dc-" +
          s"${java.lang.ProcessHandle.current().pid()}"
        graft.operators.DeconIndex.seed(spark, dPath,
          docs.filter(col("doc_id") % 50 === 0), "text", 6)
        time(graft.operators.DeconIndex.serve(spark, dPath, docs,
          "doc_id", "text", 6).count())
      })
    val total = ops.map(_._2).sum
    val qs = ops.map { case (k, v) => s""""$k":${graft.Bench.fmt(v)}""" }.mkString(",")
    s"""{"metric":"stress","value":${graft.Bench.fmt(total)},"unit":"sec","ops":{$qs},"rows":${StressData.Docs}}"""
  }
}
