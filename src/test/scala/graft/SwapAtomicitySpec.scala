package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GenDir, GraftSession, Tables}
import graft.operators.{Bucketing, Dedup, Similarity, UrlIndex}

/** Reader-atomic index swaps (VERDICT r11 item 3). Every persisted-index
  * rebuild/compaction now publishes through the committed-generation
  * discipline ([[graft.core.GenDir]] for path artifacts, the
  * `graft.committed` property flip for the catalog-table minhash index):
  * the live data never moves, publish is ONE atomic step, and grace keeps
  * one generation back for in-flight scans. These gates run a reader loop
  * in a background thread THROUGH an entire rebuild/compaction per index
  * family and assert the reader (a) never observes a failure and (b)
  * never observes a mixed or partial state — every read returns exactly
  * a committed generation's answer (for semantics-preserving maintenance
  * that is ONE reference set; for the retraining IVF rebuild it is the
  * pre- or the post-rebuild set, nothing else).
  */
class SwapAtomicitySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"
  private val pid = java.lang.ProcessHandle.current().pid()

  /** Run `read` continuously on a background thread; after the first
    * completed read, run `maintain` on the caller thread; keep reading a
    * little longer, then stop. Returns (observations, failures). */
  private def readThrough[A](read: () => A)(maintain: => Unit): (Seq[A], Seq[Throwable]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[A]
    val errs = scala.collection.mutable.ArrayBuffer.empty[Throwable]
    val stop = new AtomicBoolean(false)
    val done = new AtomicInteger(0)
    val t = new Thread(() => {
      while (!stop.get()) {
        try {
          val a = read()
          out.synchronized { out += a }
          done.incrementAndGet(): Unit
        } catch {
          case e: Throwable => errs.synchronized { errs += e }; stop.set(true)
        }
      }
    }, "graft-swap-reader")
    t.setDaemon(true)
    t.start()
    val t0 = System.currentTimeMillis()
    while (done.get() < 1 && errs.isEmpty && System.currentTimeMillis() - t0 < 60000)
      Thread.sleep(20)
    val beforeMaintain = done.get()
    maintain
    // require at least one read that started AFTER the maintenance began
    // finishes cleanly (the loop is continuous, so reads overlapped it too)
    val t1 = System.currentTimeMillis()
    while (done.get() < beforeMaintain + 2 && errs.isEmpty &&
      System.currentTimeMillis() - t1 < 60000) Thread.sleep(20)
    stop.set(true)
    t.join(60000)
    (out.synchronized(out.toSeq), errs.synchronized(errs.toSeq))
  }

  test("IVF rebuild: concurrent serves never fail and see exactly one committed generation") {
    val emb = Tables.load(spark, dir, "embeddings")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-swap-ivf-$pid"
    Similarity.buildIvfIndex(emb, path, "vec_id", "embedding")
    Similarity.appendToIvfIndex(
      emb.filter(col("vec_id") % 7 === 3)
        .select((col("vec_id") + 9000000L).as("vec_id"), col("embedding")),
      path, "vec_id", "embedding", batchId = "d1")
    val queries = emb.filter(col("vec_id") < 40)
    def serve(): Set[(Long, Long)] =
      Similarity.ivfTopKFromIndex(path, queries, "vec_id", "embedding", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pre = serve()
    val (reads, errs) = readThrough(serve)(Similarity.rebuildIvfIndex(spark, path))
    val post = serve()
    assert(errs.isEmpty, s"concurrent serve failed during rebuild: ${errs.headOption}")
    assert(reads.size >= 3, s"reader loop too thin: ${reads.size}")
    // the retrain may legitimately change approximate results — but every
    // read must be EXACTLY the old or the new generation's answer; a
    // mixed read (old codebook against new lists, or a partial dir)
    // produces neither
    val offending = reads.filterNot(r => r == pre || r == post)
    assert(offending.isEmpty,
      s"${offending.size} of ${reads.size} concurrent reads matched neither generation")
    assert(reads.contains(post) || serve() == post, "the new generation must become visible")
  }

  test("minhash rebuild: concurrent serves never fail and pair sets never change") {
    val docs = Tables.load(spark, dir, "documents")
    val table = s"swapmh_$pid"
    Dedup.dropMinhashIndex(spark, table)
    Dedup.minhashIndexWrite(docs.filter(col("doc_id") % 3 =!= 2), "doc_id", "text", table)
    Dedup.minhashIndexAppend(
      docs.filter(col("doc_id") % 3 === 2), "doc_id", "text", table, "b1")
    val delta = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 7000000L).as("doc_id"), col("text"))
    def serve(): Set[(Long, Long)] =
      Dedup.minhashLshAgainstIndex(delta, "doc_id", "text", table)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ref = serve()
    assert(ref.nonEmpty, "fixture must produce served pairs")
    val (reads, errs) = readThrough(serve)(Dedup.minhashIndexRebuild(spark, table))
    assert(errs.isEmpty, s"concurrent serve failed during rebuild: ${errs.headOption}")
    assert(reads.size >= 3, s"reader loop too thin: ${reads.size}")
    // banding is untrained: the rebuild changes NO pair semantics, so
    // every concurrent read — old generation, new generation, or
    // spanning the publish — must return the one reference set
    assert(reads.forall(_ == ref),
      s"a concurrent read diverged from the invariant pair set")
    assert(serve() == ref, "post-rebuild serve must equal the invariant pair set")
    Dedup.dropMinhashIndex(spark, table)
  }

  test("url-index compaction: concurrent membership reads never fail, set invariant") {
    import spark.implicits._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-swap-url-$pid"
    UrlIndex.seed((0 until 200).map(i => s"http://d$i.example.com/p").toDF("canonical_url"), path)
    (0 until 8).foreach { e =>
      UrlIndex.claim((0 until 40).map(i => s"http://e$e-$i.example.com/p")
        .toDF("canonical_url"), path, e.toString)
    }
    def readSet(): Set[String] =
      UrlIndex.members(spark, path).collect().map(_.getString(0)).toSet
    val ref = readSet()
    assert(ref.size == 200 + 8 * 40)
    val (reads, errs) = readThrough(readSet)(
      assert(UrlIndex.compactIfFragmented(spark, path, threshold = 1)))
    assert(errs.isEmpty, s"concurrent membership read failed: ${errs.headOption}")
    assert(reads.size >= 3, s"reader loop too thin: ${reads.size}")
    assert(reads.forall(_ == ref), "membership must be invariant under compaction")
    assert(readSet() == ref)
  }

  test("slow reader spans TWO back-to-back compactions: the time grace keeps its generation") {
    import spark.implicits._
    // the count rule alone protects a scan across ONE publish; a scan
    // resolved before two back-to-back compactions used to lose its
    // files. With the (production-default) time leg on, the resolved
    // generation survives as long as the scan is younger than maxScanAge.
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-swap-slow-$pid"
    UrlIndex.seed((0 until 100).map(i => s"http://d$i.example.com/p")
      .toDF("canonical_url"), path)
    (0 until 4).foreach { e =>
      UrlIndex.claim((0 until 20).map(i => s"http://e$e-$i.example.com/p")
        .toDF("canonical_url"), path, e.toString)
    }
    // restore the test-JVM pin afterwards (an unset falls back to the 6h
    // production default and breaks later suites' sweep assertions)
    val saved = spark.conf.getOption(GenDir.MaxScanAgeKey)
    spark.conf.set(GenDir.MaxScanAgeKey, GenDir.DefaultMaxScanAgeMs.toString)
    try {
      // the slow scan resolves its generation ONCE, here
      val resolved = GenDir.resolveRequired(spark, path)
      val before = spark.read.parquet(resolved).count()
      // two back-to-back maintenance publishes while the scan is "running"
      assert(UrlIndex.compactIfFragmented(spark, path, threshold = 1))
      UrlIndex.claim((0 until 5).map(i => s"http://x$i.example.com/p")
        .toDF("canonical_url"), path, "x")
      assert(UrlIndex.compactIfFragmented(spark, path, threshold = 1))
      assert(GenDir.resolveRequired(spark, path) != resolved,
        "two generations must have published past the scan's snapshot")
      // the scan finishes against its original generation, files intact
      assert(spark.read.parquet(resolved).count() == before,
        "a scan inside the time-grace window must keep its files across " +
          "two back-to-back publishes")
    } finally saved.fold(spark.conf.unset(GenDir.MaxScanAgeKey))(
      spark.conf.set(GenDir.MaxScanAgeKey, _))
  }

  test("dataset compaction: concurrent reads through Bucketing.current never fail, content invariant") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-swap-compact-$pid"
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    ev.repartition(32).write.mode("overwrite").parquet(base)
    // first compaction migrates the flat dir (the documented one-time
    // non-atomic step) — run it BEFORE the concurrent gate
    Bucketing.compact(spark, base, targetBytes = 1L << 16)
    def readSum(): (Long, Long) = {
      val r = spark.read.parquet(Bucketing.current(spark, base))
        .agg(count(lit(1)), sum(col("event_id"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val ref = readSum()
    val (reads, errs) = readThrough(readSum)(
      Bucketing.compact(spark, base, targetBytes = 1L << 20): Unit)
    assert(errs.isEmpty, s"concurrent read failed during compaction: ${errs.headOption}")
    assert(reads.size >= 3, s"reader loop too thin: ${reads.size}")
    assert(reads.forall(_ == ref), "content must be invariant under compaction")
    assert(readSum() == ref)
  }
}
