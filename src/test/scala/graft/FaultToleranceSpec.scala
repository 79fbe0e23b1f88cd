package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.SparkEnv
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.Dedup

/** Shared injection state for the failing-once task kill (statics are
  * visible to local-mode executor threads — same JVM). */
object FtInjection {
  val fired = new AtomicBoolean(false)
}

/** Fault-tolerance gate for the dedup family (VERDICT r6 item 1).
  *
  * The minhash candidate-verify path and the connected-components min-label
  * loop used to pin intermediates with `localCheckpoint(true)` — executor
  * blocks with lineage DISCARDED, so one lost executor failed a multi-hour
  * 100 TB job. They now use lineage-preserving persist
  * ([[GraftSession.pin]]) plus a RELIABLE durable checkpoint every
  * [[Dedup.CcCheckpointEvery]] rounds inside the iterative loop. This suite
  * proves both halves of that story on a dedicated `local[4,2]` context
  * (task retries enabled, like any real cluster):
  *
  *  1. block loss: drop EVERY persisted block behind the scheduler's back
  *     mid-pipeline; the job recomputes from lineage / durable checkpoint
  *     files and produces identical output (the old localCheckpoint path
  *     dies here with "checkpoint block not found");
  *  2. task kill: a failing-once injection inside the corpus scan; the
  *     retried task completes the job with output identical to a clean run.
  */
class FaultToleranceSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  // Dedicated context with task retries (local[n] alone = maxFailures 1,
  // a local-mode artifact no cluster has). Built once for the suite; torn
  // down in the JVM's suite sequence by the next GraftSession.local call
  // being free to recreate.
  private lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = GraftSession.configure(
      SparkSession.builder().master("local[4,2]").appName("graft-ft"),
      shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(s)
    GraftSession.installOptimizerRules(s)
    s
  }

  /** Drop every persisted RDD block via the block manager master — the
    * observable a dead executor leaves behind (the cache manager is NOT
    * told, exactly as in real block loss). */
  private def dropAllCachedBlocks(): Unit = {
    val sc = spark.sparkContext
    sc.getPersistentRDDs.keys.foreach { id =>
      SparkEnv.get.blockManager.master.removeRdd(id, blocking = true)
    }
  }

  test("connected components: losing every cached block mid-loop recomputes, identical labels") {
    import spark.implicits._
    // a chain long enough to force several min-label rounds (diameter 9 →
    // crosses the reliable-checkpoint cadence), plus stars and pairs
    val chain = (1L to 9L).map(i => (i, i + 1))
    val pairs = (chain ++ Seq((100L, 101L), (100L, 102L), (200L, 201L)))
      .toDF("doc_a", "doc_b")
    // maxLocalEdges = 0 forces the distributed loop (no driver union-find)
    val labels = Dedup.connectedComponents(pairs, maxIter = 20, maxLocalEdges = 0L)
    val expected = labels.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(expected.nonEmpty && expected.map(_._2).distinct.length > 1,
      "fixture should have >1 component")

    dropAllCachedBlocks()
    val again = labels.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(again.toSeq == expected.toSeq,
      "labels must survive total cache-block loss via lineage/reliable checkpoint")
    // chain collapses to min id 1; star to 100; pair to 200
    val reps = again.toMap
    assert((1L to 10L).forall(reps(_) == 1L))
    assert(Seq(100L, 101L, 102L).forall(reps(_) == 100L))
    assert(Seq(200L, 201L).forall(reps(_) == 200L))
  }

  test("minhash verify path: block loss after candidate pinning recomputes, identical pairs") {
    val docs = Tables.load(spark, dir, "documents")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", 3, 128, 32, 0.8)
    val expected = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(expected.nonEmpty, "sf0.001 documents carry planted near-dups")
    dropAllCachedBlocks()
    val again = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(again.toSeq == expected.toSeq)
  }

  test("failing-once task kill mid-pipeline: job completes, output identical to clean run") {
    val docs = Tables.load(spark, dir, "documents")
    val clean = Dedup.dropNearDuplicates(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted

    val failOnce = udf { (id: Long) =>
      if (FtInjection.fired.compareAndSet(false, true))
        throw new RuntimeException("graft-ft: injected task failure")
      true
    }
    FtInjection.fired.set(false)
    val injected = Dedup.dropNearDuplicates(
        docs.filter(failOnce(col("doc_id"))), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(FtInjection.fired.get(), "injection must actually have fired")
    assert(injected.toSeq == clean.toSeq,
      "a killed-and-retried task must not change the result")
  }

  test("containment + perceptual dedup: failing-once task kill — identical output") {
    val docs = Tables.load(spark, dir, "documents")
    val failOnce = udf { (id: Long) =>
      if (FtInjection.fired.compareAndSet(false, true))
        throw new RuntimeException("graft-ft: injected task failure")
      true
    }
    val cleanCont = graft.operators.Dedup
      .containmentPairs(docs, "doc_id", "text", "lang", 3, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(cleanCont.nonEmpty)
    FtInjection.fired.set(false)
    val contInjected = graft.operators.Dedup.containmentPairs(
        docs.filter(failOnce(col("doc_id"))), "doc_id", "text", "lang", 3, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(FtInjection.fired.get(), "injection must actually have fired")
    assert(contInjected.toSeq == cleanCont.toSeq)

    val media = docs.withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media", graft.operators.Media.asMedia("payload", "image/stub"))
    val cleanPairs = graft.operators.Media
      .perceptualDupPairs(media, "doc_id", "media", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    FtInjection.fired.set(false)
    val phashInjected = graft.operators.Media.perceptualDupPairs(
        media.filter(failOnce(col("doc_id"))), "doc_id", "media", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(FtInjection.fired.get(), "injection must actually have fired")
    assert(phashInjected.toSeq == cleanPairs.toSeq)
  }

  test("jdbc sink: killed-and-retried staging task still lands rows exactly once") {
    import graft.sinks.JdbcSink
    val dbPath = s"${System.getProperty("java.io.tmpdir")}/graft-derby-spec/ft"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(dbPath))
    val url = s"jdbc:derby:$dbPath;create=true"
    val sup = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    val n = sup.count()
    val failOnce = udf { (id: Long) =>
      if (FtInjection.fired.compareAndSet(false, true))
        throw new RuntimeException("graft-ft: injected staging failure")
      true
    }
    FtInjection.fired.set(false)
    // the kill lands inside stageEpoch's DELETE+INSERT transaction; the
    // retried attempt rolls back and re-stages its partition idempotently
    JdbcSink.writeEpochExactlyOnce(
      sup.filter(failOnce(col("s_suppkey"))), url, "sup", "ftq", 0L)
    assert(FtInjection.fired.get(), "injection must actually have fired")
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM sup")
      rs.next()
      assert(rs.getLong(1) == n, "retried staging task must not duplicate or drop rows")
      val rs2 = c.createStatement().executeQuery("SELECT COUNT(*) FROM sup_stage")
      rs2.next()
      assert(rs2.getLong(1) == 0L)
    } finally c.close()
  }

  test("groupedPrefixScan consumers: block loss mid-pipeline recomputes, identical output") {
    import graft.operators.Pipeline
    val docs = Tables.load(spark, dir, "documents")
    val packed = Pipeline.packSequences(docs, "doc_id", "text", "lang", 4096)
    val expP = packed.collect().map(_.toSeq).toSet
    val kept = Pipeline.selectToBudget(docs, "lang", "doc_id",
      col("n_chars").cast("double"), col("n_chars"), 40000L)
    val expK = kept.select("doc_id").collect().map(_.getLong(0)).sorted
    dropAllCachedBlocks()
    assert(packed.collect().map(_.toSeq).toSet == expP,
      "packSequences must survive cache-block loss via lineage")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == expK.toSeq,
      "selectToBudget must survive cache-block loss via lineage")
  }

  test("teardown: release the retrying context for subsequent suites") {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    assert(true)
  }
}
