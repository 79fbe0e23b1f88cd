package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.sources.GraftSources
import graft.sources.hub.MemHub

/** DSv2 pushdown surfaces beyond filters/columns: top-N and limit into the
  * sorted-set scan, complete COUNT(*) into the document scan, and reported
  * key-grouped partitioning from the stream scan (exchange-free groupBy). */
class PushdownSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("zset: ORDER BY score LIMIT n is served by the store (no Spark sort)") {
    val uri = "hub:test/zset-topn"
    MemHub.zadd(s"$uri/z", (0 until 100).iterator.map(i => s"m$i" -> i.toDouble))
    val top = GraftSources.redisSortedSet(spark, uri, "z")
      .orderBy(col("score").desc).limit(3)
    val plan = physical(top)
    assert(plan.contains("topN=3 DESC"), s"topN not pushed:\n$plan")
    assert(!plan.contains("TakeOrderedAndProject") && !plan.contains("Sort "),
      s"Spark still sorting:\n$plan")
    assert(top.select("score").collect().map(_.getDouble(0)).toSeq == Seq(99.0, 98.0, 97.0))

    val asc = GraftSources.redisSortedSet(spark, uri, "z")
      .filter(col("score") >= 90.0).orderBy(col("score")).limit(2)
    assert(physical(asc).contains("topN=2 ASC"))
    assert(asc.select("score").collect().map(_.getDouble(0)).toSeq == Seq(90.0, 91.0))

    val lim = GraftSources.redisSortedSet(spark, uri, "z").limit(5)
    assert(physical(lim).contains("topN=5"), "bare limit not pushed")
    assert(lim.count() == 5)
  }

  test("mongo: COUNT(*) with predicates answered server-side (complete pushdown)") {
    val uri = "hub:test/mongo-count"
    MemHub.insertMany(uri, (1 to 50).iterator.map(i => s"""{"id":$i,"v":${i % 5}}"""))
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", LongType)))
    val df = spark.read.format("graft-mongo").schema(schema).option("uri", uri).load()
      .filter(col("v") === 0)
    val agg = df.groupBy().count()
    assert(physical(agg).contains("agg=count(*)"),
      s"count not pushed:\n${physical(agg)}")
    assert(agg.head().getLong(0) == 10L)
    // and the unfiltered scan still returns documents
    assert(df.count() == 10L)
  }

  test("mongo: LIMIT served by the cursor — no extra docs read, Spark Limit dropped") {
    import graft.sources.mongo.MongoScanStats
    val uri = "hub:test/mongo-limit"
    MemHub.insertMany(uri, (1 to 100).iterator.map(i => s"""{"id":$i,"v":${i % 5}}"""))
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", LongType)))
    val df = spark.read.format("graft-mongo").schema(schema).option("uri", uri).load()
      .filter(col("v") === 0).limit(3)
    val plan = physical(df)
    assert(plan.contains("limit=3"), s"limit not pushed:\n$plan")
    assert(!plan.contains("GlobalLimit"), s"Spark Limit should drop (complete pushdown):\n$plan")
    MongoScanStats.emitted.set(0)
    assert(df.count() == 3)
    // lazy cursor: only the 3 limited matches were ever materialized
    assert(MongoScanStats.emitted.get() == 3,
      s"cursor read past the limit: emitted=${MongoScanStats.emitted.get()}")
  }

  test("mongo: ORDER BY ... LIMIT is served by the store (TopN pushdown)") {
    import graft.sources.mongo.MongoScanStats
    val uri = "hub:test/mongo-topn"
    MemHub.insertMany(uri, (1 to 100).iterator.map(i =>
      s"""{"id":$i,"v":${(i * 37) % 100},"s":"x${i % 7}"}"""))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", LongType), StructField("s", StringType)))
    def scan = spark.read.format("graft-mongo").schema(schema).option("uri", uri).load()
    val top = scan.orderBy(col("v").desc, col("id")).limit(4)
    val plan = physical(top)
    assert(plan.contains("sort=") && plan.contains("limit=4"), s"topN not pushed:\n$plan")
    assert(!plan.contains("TakeOrderedAndProject") && !plan.contains("Sort "),
      s"Spark still sorting:\n$plan")
    val expected = scan.collect().map(r => (r.getLong(1), r.getLong(0)))
      .sortBy { case (v, id) => (-v, id) }.take(4).map(_._2).toSeq
    MongoScanStats.emitted.set(0)
    assert(top.select("id").collect().map(_.getLong(0)).toSeq == expected)
    // store-side cursor emitted only the top-N rows
    assert(MongoScanStats.emitted.get() == 4,
      s"cursor emitted past the topN: ${MongoScanStats.emitted.get()}")
    // predicates compose with the pushed sort
    val filtered = scan.filter(col("s") === "x3").orderBy(col("v")).limit(2)
    val fexp = scan.filter(col("s") === "x3").collect()
      .map(r => (r.getLong(1), r.getLong(0))).sortBy(identity).take(2).map(_._2).toSeq
    assert(filtered.select("id").collect().map(_.getLong(0)).toSeq == fexp)
  }

  test("mongo: broadcast-join keys runtime-filter the scan (DPP analog)") {
    import graft.sources.mongo.MongoScanStats
    val uri = "hub:test/mongo-rtf"
    MemHub.insertMany(uri, (1 to 200).iterator.map(i => s"""{"id":$i,"v":"x$i"}"""))
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val fact = spark.read.format("graft-mongo").schema(schema).option("uri", uri).load()
    // the dim side needs a selective predicate for Spark to consider
    // runtime pruning (PartitionPruning.hasSelectivePredicate)
    val dim = spark.range(1, 1000).filter(col("id") < 6).select(col("id").as("did"))
    val joined = fact.join(broadcast(dim), col("id") === col("did"))
    MongoScanStats.emitted.set(0)
    assert(joined.count() == 5)
    val emitted = MongoScanStats.emitted.get()
    assert(emitted == 5,
      s"runtime In-filter should have narrowed find() to the 5 build-side keys, emitted=$emitted")
  }

  test("influx: time filters narrow the server range, untouched maps pruned") {
    val uri = "hub:test/influx-push"
    MemHub.writePoints(uri, "cpu", (0 until 100).iterator.map(i =>
      (i * 1000L, Map("host" -> s"h${i % 3}"), Map("load" -> i.toDouble))))
    val df = GraftSources.influx(spark, uri, "cpu")
      .filter(col("time") >= new java.sql.Timestamp(20000L) &&
        col("time") < new java.sql.Timestamp(30000L))
      .select(col("time"))
    val plan = physical(df)
    assert(plan.contains("time=[20000,29999]") || plan.contains("time=[20000,30000]"),
      s"time range not narrowed:\n$plan")
    assert(plan.contains("cols=time"), s"maps not pruned:\n$plan")
    assert(df.count() == 10)
  }

  test("stream scan reports key-grouped partitioning: groupBy(stream) has no exchange") {
    val uri = "hub:test/stream-kgp"
    for (s <- Seq("s-a", "s-b", "s-c"))
      MemHub.xadd(uri, s,
        (1 to (s.last - 'a' + 1) * 10).iterator.map(i => Map("i" -> i.toString)))
    val counts = GraftSources.redisStreamBatch(spark, uri, Seq("s-a", "s-b", "s-c"))
      .groupBy(col("stream")).agg(count(lit(1)).as("n"))
    val plan = physical(counts)
    assert(!plan.contains("Exchange"), s"groupBy(stream) still shuffles:\n$plan")
    assert(counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("s-a" -> 10L, "s-b" -> 20L, "s-c" -> 30L))
  }
}
