package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.sinks.JdbcSink

/** Exactly-once JDBC sink (VERDICT r6 item 3 — the `JdbcXaTest` analog)
  * against embedded Derby: a real transactional JDBC engine, so prepared
  * (staged) data genuinely survives disconnects and promotion is genuinely
  * atomic — nothing is mocked. */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  private def freshUrl(name: String): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-derby-spec/$name"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(path))
    s"jdbc:derby:$path;create=true"
  }

  private def one(url: String, sql: String): Long = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(sql)
      rs.next(); rs.getLong(1)
    } finally c.close()
  }

  test("jdbcUpsert: round-trip, and re-running the whole write converges (idempotent)") {
    val url = freshUrl("upsert")
    val sup = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    JdbcSink.jdbcUpsert(sup, url, "sup", Seq("s_suppkey"))
    val n = sup.count()
    assert(one(url, "SELECT COUNT(*) FROM sup") == n)
    // re-run: same rows, plus an updated value for one key — converges
    JdbcSink.jdbcUpsert(sup.withColumn("s_acctbal",
      when(col("s_suppkey") === 1L, lit(99999.0)).otherwise(col("s_acctbal"))),
      url, "sup", Seq("s_suppkey"))
    assert(one(url, "SELECT COUNT(*) FROM sup") == n, "upsert must not duplicate")
    assert(one(url, "SELECT CAST(s_acctbal AS BIGINT) FROM sup WHERE s_suppkey = 1") == 99999L)
  }

  test("staged epoch survives disconnect and is promoted atomically (XA prepare/commit analog)") {
    val url = freshUrl("twophase")
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    JdbcSink.stageEpoch(df, url, "t", epochId = 7L)
    // all staging connections are closed now — the "disconnect". A fresh
    // connection still sees the staged (prepared) rows, target untouched:
    assert(one(url, "SELECT COUNT(*) FROM t_stage WHERE g_epoch = 7") == 3L)
    assert(one(url, "SELECT COUNT(*) FROM t") == 0L)
    // later connection commits the prepared work — rows appear exactly once
    assert(JdbcSink.promoteEpoch(url, "t", "q", 7L))
    assert(one(url, "SELECT COUNT(*) FROM t") == 3L)
    assert(one(url, "SELECT COUNT(*) FROM t_stage") == 0L)
  }

  test("replayed epoch is skipped; restart after crash-before-promote lands exactly once") {
    val url = freshUrl("replay")
    import spark.implicits._
    val df = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x")
    // crash-before-promote: epoch staged (possibly multiple times — task
    // retries and the restarted attempt re-stage idempotently)...
    JdbcSink.stageEpoch(df, url, "r", 0L)
    JdbcSink.stageEpoch(df, url, "r", 0L)
    assert(one(url, "SELECT COUNT(*) FROM r_stage WHERE g_epoch = 0") == 2L,
      "re-staging must replace, not append")
    // ...then the restarted job runs the full exactly-once write
    assert(JdbcSink.writeEpochExactlyOnce(df, url, "r", "q", 0L))
    assert(one(url, "SELECT COUNT(*) FROM r") == 2L)
    // replay of the committed epoch: ledger says done — skipped wholesale
    assert(!JdbcSink.writeEpochExactlyOnce(df, url, "r", "q", 0L))
    assert(one(url, "SELECT COUNT(*) FROM r") == 2L, "replay must not duplicate")
    assert(one(url, "SELECT COUNT(*) FROM r_stage") == 0L)
    // a new epoch still goes through
    assert(JdbcSink.writeEpochExactlyOnce(
      Seq((3L, 30.0)).toDF("id", "x"), url, "r", "q", 1L))
    assert(one(url, "SELECT COUNT(*) FROM r") == 3L)
  }

  test("abortEpoch drops staged rows without touching the target (XA rollback analog)") {
    val url = freshUrl("abort")
    import spark.implicits._
    JdbcSink.writeEpochExactlyOnce(Seq((1L, "keep")).toDF("id", "v"), url, "a", "q", 0L)
    JdbcSink.stageEpoch(Seq((2L, "doomed")).toDF("id", "v"), url, "a", 1L)
    JdbcSink.abortEpoch(url, "a", 1L)
    assert(one(url, "SELECT COUNT(*) FROM a_stage") == 0L)
    assert(one(url, "SELECT COUNT(*) FROM a") == 1L)
    // the aborted epoch can be retried later with corrected data
    assert(JdbcSink.writeEpochExactlyOnce(Seq((2L, "fixed")).toDF("id", "v"), url, "a", "q", 1L))
    assert(one(url, "SELECT COUNT(*) FROM a") == 2L)
  }

  test("foreachBatch adapter drives a real streaming query exactly-once across restart") {
    val url = freshUrl("stream")
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    mem.addData((1L, "x"), (2L, "y"))
    val q = mem.toDF().toDF("id", "v").writeStream
      .foreachBatch(JdbcSink.foreachBatchExactlyOnce(url, "s", "streamq"))
      .outputMode("append").start()
    q.processAllAvailable()
    mem.addData((3L, "z"))
    q.processAllAvailable()
    q.stop()
    assert(one(url, "SELECT COUNT(*) FROM s") == 3L)
    // recovery replay of batch 0 (same ids the checkpoint would redeliver)
    JdbcSink.foreachBatchExactlyOnce(url, "s", "streamq")(
      Seq((1L, "x"), (2L, "y")).toDF("id", "v"), 0L)
    assert(one(url, "SELECT COUNT(*) FROM s") == 3L, "replayed micro-batch must be a no-op")
  }

  test("sink table reads back through Spark's JDBC source") {
    val url = freshUrl("readback")
    val sup = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    JdbcSink.writeEpochExactlyOnce(sup, url, "sup", "q", 0L)
    val back = JdbcSink.readTable(spark, url, "sup")
    assert(back.count() == sup.count())
    val a = back.select(sum(col("s_acctbal").cast("decimal(18,2)"))).collect()(0).getDecimal(0)
    val b = sup.select(sum(col("s_acctbal").cast("decimal(18,2)"))).collect()(0).getDecimal(0)
    assert(a == b)
  }

  test("JDBC source pushdown: the filter reaches the database scan") {
    val url = freshUrl("pushdown")
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    JdbcSink.writeEpochExactlyOnce(cust, url, "cust", "q", 0L)
    val q = JdbcSink.readTable(spark, url, "cust")
      .filter(col("c_acctbal") > 1000.0 && col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThan(C_ACCTBAL") || plan.contains("GreaterThan(c_acctbal")),
      s"filter must be pushed to the JDBC scan:\n${plan.take(800)}")
    val n = q.count()
    val expect = cust.filter(col("c_acctbal") > 1000.0 && col("c_mktsegment") === "BUILDING").count()
    assert(n == expect)
  }
}
