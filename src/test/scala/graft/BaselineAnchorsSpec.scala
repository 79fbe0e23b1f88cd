package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.sources.GraftSources
import graft.sources.hub.MemHub

/** The reference's own quantitative anchors (BASELINE.md), replayed at the
  * SAME scale — not scaled-down analogs:
  *
  *  - Redis hash batch ingest: 1,000,000 entries round-trip
  *    (`/root/reference/redis/src/test/java/com/hazelcast/jet/contrib/redis/RedisSourceTest.java:80-92`)
  *  - Redis sorted-set range scan: 400,001 of 1,000,000 elements for the
  *    inclusive score range [100000, 500000], score-ordered
  *    (`RedisSourceTest.java:109-128`)
  */
class BaselineAnchorsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(8)

  test("redis hash 1M-entry ingest round-trip (RedisSourceTest.java:80-92 scale)") {
    val uri = "hub:test/anchor-hash-1m"
    spark.range(0, 1000000)
      .select(col("id").cast("string").as("key"),
        concat(lit("v"), col("id")).as("value"))
      .repartition(8)
      .write.format("graft-redis-hash").option("uri", uri).option("hash", "h")
      .mode("append").save()
    val back = GraftSources.redisHash(spark, uri, "h")
    assert(back.count() === 1000000L)
    // spot-check content integrity after the two-phase promote
    val spot = back.filter(col("key").isin("0", "424242", "999999"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(spot === Map("0" -> "v0", "424242" -> "v424242", "999999" -> "v999999"))
  }

  test("zset range scan: 400,001 of 1M for [100000,500000], score-ordered (RedisSourceTest.java:109-128 scale)") {
    val uri = "hub:test/anchor-zset-1m"
    MemHub.zadd(s"$uri/z",
      (0 until 1000000).iterator.map(i => (s"m$i", i.toDouble)))
    val scanned = GraftSources.redisSortedSet(
      spark, uri, "z", from = Some(100000.0), to = Some(500000.0))
    assert(scanned.count() === 400001L,
      "inclusive score range must return exactly 400,001 of 1M elements")
    val ordered = scanned.orderBy(col("score")).limit(3)
      .collect().map(_.getAs[Double]("score")).toSeq
    assert(ordered === Seq(100000.0, 100001.0, 100002.0))
    val top = scanned.orderBy(col("score").desc).limit(1)
      .collect().head.getAs[Double]("score")
    assert(top === 500000.0)
  }
}
