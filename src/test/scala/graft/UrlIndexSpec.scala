package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UrlIndex

/** The q156 url index's lifecycle gate (VERDICT r10 item 4): per-epoch
  * claims land exactly-once, the file count stays BOUNDED over many
  * epochs because compaction folds claim generations, and membership —
  * the only semantics the index has — is invariant under every
  * maintenance action. */
class UrlIndexSpec extends AnyFunSuite {
  lazy val spark = graft.core.GraftSession.local(4)

  private def urls(ids: Range) = {
    import spark.implicits._
    ids.map(i => s"http://d$i.example.com/p").toDF("canonical_url")
  }

  private def memberSet(path: String): Set[String] =
    UrlIndex.members(spark, path).collect().map(_.getString(0)).toSet

  test("many epochs stay bounded: claims fragment, compaction folds, membership invariant") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-urlidx-spec-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    UrlIndex.seed(urls(0 until 50), path)
    val expected = scala.collection.mutable.Set.empty[String] ++ memberSet(path)
    assert(expected.size == 50)
    // 40 "daily" epochs with maintenance riding each one (the q156
    // foreachBatch shape); threshold low so the spec exercises several
    // compaction generations, not just one
    val threshold = 12
    var compactions = 0
    var maxFiles = 0
    (0 until 40).foreach { epoch =>
      val batch = urls(1000 + epoch * 10 until 1000 + epoch * 10 + 10)
      UrlIndex.claim(batch, path, epoch.toString)
      expected ++= batch.collect().map(_.getString(0))
      if (UrlIndex.compactIfFragmented(spark, path, threshold)) compactions += 1
      val files = UrlIndex.fileCount(spark, path)
      maxFiles = math.max(maxFiles, files)
      assert(files <= threshold + spark.sparkContext.defaultParallelism,
        s"epoch $epoch: $files files — compaction is not bounding growth")
    }
    assert(compactions >= 2,
      s"40 epochs over threshold $threshold must compact repeatedly, saw $compactions")
    assert(memberSet(path) == expected.toSet,
      "membership must be invariant across claims and compactions")
    // post-compaction set is duplicate-free rows, not just duplicate-free set
    val total = UrlIndex.members(spark, path).count()
    UrlIndex.compactIfFragmented(spark, path, threshold = 0)
    assert(UrlIndex.members(spark, path).count() == expected.size.toLong &&
      total >= expected.size.toLong,
      "a forced compaction must leave exactly one row per url")
  }

  test("claim is exactly-once per batchId: a retried epoch replaces, never duplicates") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-urlidx-retry-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    UrlIndex.seed(urls(0 until 5), path)
    UrlIndex.claim(urls(100 until 110), path, "7")
    val before = UrlIndex.members(spark, path).count()
    // foreachBatch retry of the SAME epoch (checkpoint replay) — the
    // partition-dir overwrite must replace the prior write
    UrlIndex.claim(urls(100 until 110), path, "7")
    assert(UrlIndex.members(spark, path).count() == before,
      "a retried claim must not grow the index")
    assert(memberSet(path).count(_.contains("d10")) > 0)
    // a PARTIAL prior write is also replaced, not merged
    UrlIndex.claim(urls(100 until 105), path, "8")
    UrlIndex.claim(urls(100 until 110), path, "8")
    assert(UrlIndex.members(spark, path).count() == before + 10,
      "a DIFFERENT batch re-claiming the same urls adds its own rows " +
        "(set semantics preserved; compaction cleans the rows)")
    assert(memberSet(path).size == 15, "membership is still the 15-url set")
    UrlIndex.compactIfFragmented(spark, path, threshold = 0)
    assert(UrlIndex.members(spark, path).count() == 15,
      "compaction must fold cross-batch duplicate rows")
  }

  test("claim racing a compaction re-writes into the published generation") {
    import graft.core.GenDir
    // reproduce the ADVICE r12 window exactly: a compaction publishes
    // BETWEEN the claim's batch write and its live-generation re-check —
    // without the re-write the claim would sit only in the superseded
    // generation and die with the grace sweep
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-urlidx-race-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    UrlIndex.seed(urls(0 until 20), path)
    (0 until 3).foreach(e =>
      UrlIndex.claim(urls(100 + e * 5 until 105 + e * 5), path, e.toString))
    val claimed = (900 until 905).map(i => s"http://d$i.example.com/p")
    var fired = 0
    UrlIndex.claimRaceProbe = () => {
      // fire on the first write only — the RE-write's probe must not
      // publish again or the claim never stabilizes
      if (fired == 0) {
        fired += 1
        assert(UrlIndex.compactIfFragmented(spark, path, threshold = 1))
      }
    }
    try {
      import spark.implicits._
      UrlIndex.claim(claimed.toDF("canonical_url"), path, "raced")
    } finally UrlIndex.claimRaceProbe = () => ()
    assert(fired == 1, "the racing compaction must have run inside the window")
    // the claim must be visible in the LIVE generation lineage...
    assert(claimed.toSet.subsetOf(memberSet(path)),
      "a raced claim must be re-written into the published generation")
    val live = GenDir.resolveRequired(spark, path)
    val liveRows = spark.read.parquet(live)
      .select(col("canonical_url")).collect().map(_.getString(0)).toSet
    assert(claimed.toSet.subsetOf(liveRows),
      "the raced batch must live in the CURRENT generation, not only the doomed one")
    // ...and survive the next full compaction + sweep cycle
    UrlIndex.claim(urls(300 until 305), path, "after")
    assert(UrlIndex.compactIfFragmented(spark, path, threshold = 1))
    assert(claimed.toSet.subsetOf(memberSet(path)),
      "the raced claim must survive later compactions and sweeps")
  }

  test("compaction publishes generations: grace keeps one back, debris is swept") {
    import graft.core.GenDir
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-urlidx-swap-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    UrlIndex.seed(urls(0 until 20), path)
    (0 until 6).foreach(e => UrlIndex.claim(urls(200 + e * 5 until 205 + e * 5), path, e.toString))
    val live0 = GenDir.resolveRequired(spark, path)
    assert(UrlIndex.compactIfFragmented(spark, path, threshold = 1))
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live1 = GenDir.resolveRequired(spark, path)
    assert(live1 != live0, "compaction must publish a new generation")
    assert(f.exists(new org.apache.hadoop.fs.Path(live0)),
      "grace must keep the previous generation for in-flight readers")
    val folded = f.listStatus(new org.apache.hadoop.fs.Path(live1))
      .filter(_.isDirectory).map(_.getPath.getName).toSeq
    assert(folded == Seq("batch=c"), s"compaction folds everything into one dir: $folded")
    // second compaction advances the generation and drops generation 0
    UrlIndex.claim(urls(300 until 305), path, "x1")
    assert(UrlIndex.compactIfFragmented(spark, path, threshold = 1))
    val live2 = GenDir.resolveRequired(spark, path)
    assert(live2 != live1, s"generation must advance: $live2")
    assert(!f.exists(new org.apache.hadoop.fs.Path(live0)),
      "generations behind the grace window must be deleted")
    assert(f.exists(new org.apache.hadoop.fs.Path(live1)), "grace keeps one back")
    assert(memberSet(path).size == 20 + 30 + 5)
  }
}
