package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.Media
import graft.streaming.{ServiceMap, Timestamps}

class MediaServiceSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("media decode stub: batch shape, deterministic features, any partitioning") {
    val media = Tables.load(spark, dir, "documents")
      .withColumn("bin", encode(col("text"), "UTF-8"))
      .withColumn("media", Media.asMedia("bin", "text/plain"))
    val one = Media.decodeAndFeaturize(media.repartition(1), "doc_id", "media")
      .orderBy("id").collect()
    val many = Media.decodeAndFeaturize(media.repartition(13), "doc_id", "media")
      .orderBy("id").collect()
    assert(one.length == 500)
    assert(one.map(_.toString).toSeq == many.map(_.toString).toSeq,
      "features must not depend on partitioning")
    val f = one.head.getSeq[Float](5)
    assert(f.length == 16 && math.abs(f.sum - 1.0f) < 1e-3, "normalized histogram")
  }

  test("frame-sample stub emits n evenly spaced offsets") {
    val offs = Media.StubCodec.frameOffsets(Array.fill[Byte](1000)(1), 4)
    assert(offs.toSeq == Seq(0, 250, 500, 750))
  }

  test("resize stub: fixed byte budget, partition-invariant") {
    val media = Tables.load(spark, dir, "documents")
      .withColumn("bin", encode(col("text"), "UTF-8"))
      .withColumn("media", Media.asMedia("bin", "text/plain"))
    val out = Media.resizeAll(media.repartition(7), "doc_id", "media", targetLen = 64)
      .orderBy("id").collect()
    assert(out.length == 500)
    assert(out.forall(_.getInt(2) <= 64))
    val again = Media.resizeAll(media.repartition(2), "doc_id", "media", 64)
      .orderBy("id").collect()
    assert(out.map(_.getAs[Array[Byte]](1).toSeq).toSeq ==
      again.map(_.getAs[Array[Byte]](1).toSeq).toSeq)
  }

  test("perceptual-hash dedup: identical payloads at distance 0, " +
      "1-byte edits nearby, unrelated payloads apart") {
    val base = Array.tabulate(5000)(i => ((i * 31 + 7) % 251).toByte)
    val edited = base.clone(); edited(2500) = (edited(2500) + 90).toByte
    val unrelated = Array.tabulate(5000)(i => ((i * 17 + 131) % 239).toByte)
    val rows = Seq((1L, base), (2L, base.clone()), (3L, edited), (4L, unrelated))
    val df = rows.toDF("doc_id", "payload")
      .withColumn("media", Media.asMedia("payload", "image/stub"))
    val pairs = Media.perceptualDupPairs(df, "doc_id", "media", maxDist = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((1L, 2L)).contains(0), s"identical pair missing/off: $pairs")
    // a single-byte edit perturbs at most one stride sample → ≤ 2 dHash
    // bits → the pigeonhole join must surface it
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 2,
      s"edited pair not near: $pairs")
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).contains(4L) },
      s"unrelated payload paired: $pairs")
    // phash is partition-invariant (row-local)
    val h1 = Media.phashAll(df, "doc_id", "media").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = Media.phashAll(df.repartition(5), "doc_id", "media").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 == h2)
  }

  test("rolling_hash64: incremental roll equals full hash; distinct-preserving") {
    import graft.functions.{rolling_fingerprint64, RollingHash64}
    val bytes = "the quick brown fox".getBytes("UTF-8")
    val full = RollingHash64.hash(bytes)
    val rolled = bytes.foldLeft(0xcbf29ce484222325L)((h, b) => RollingHash64.roll(h, b))
    assert(full == rolled, "roll() must reproduce the block computation")
    val docs = Tables.load(spark, dir, "documents")
    val n = docs.agg(countDistinct(rolling_fingerprint64(col("text")))).head().getLong(0)
    assert(n == 500, s"500 distinct docs must yield 500 distinct fingerprints, got $n")
  }

  test("mapUsingService: service created once per partition (HashingSupport analog)") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    // note: counter mutates on executors — same JVM in local mode
    val ds = spark.range(0, 1000).repartition(4).as[Long]
    val out = ServiceMap.mapUsingService(ds, () => {
      GraftCounters.services.incrementAndGet(); new StringBuilder("svc")
    })((svc, v) => v * 2 + svc.length - 3)
    GraftCounters.services.set(0)
    assert(out.collect().sorted.toSeq == (0L until 2000L by 2).toSeq)
    assert(GraftCounters.services.get() == 4,
      s"expected one service per partition, got ${GraftCounters.services.get()}")
  }

  test("timestamp policies compose with streaming aggregation") {
    val df = Tables.load(spark, dir, "events")
    val stamped = Timestamps.withIngestionTimestamps(df)
    assert(stamped.columns.contains("ingest_time"))
    val derived = Timestamps.addTimestamps(
      spark.readStream.format("rate").option("rowsPerSecond", "1").load(),
      col("timestamp"), lagMs = 5000)
    assert(derived.isStreaming && derived.columns.contains("event_time"))
  }

  test("streaming dedup within watermark (exactly-once sink idiom, SURVEY §7.3)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val deduped = input.toDF().toDF("id", "ts")
      .withWatermark("ts", "1 minute")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_wm").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    input.addData((1L, t0), (2L, t0), (1L, t0)) // dup in batch
    q.processAllAvailable()
    input.addData((2L, t0), (3L, t0)) // dup across batches
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_wm").select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"got $ids")
  }
}

object GraftCounters {
  val services = new java.util.concurrent.atomic.AtomicInteger(0)
}
