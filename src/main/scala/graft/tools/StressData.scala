package graft.tools

import java.util.SplittableRandom

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial ~10×-sf0.1 corpus for the scale/skew stress gate: same
  * table shapes as `/root/testdata` (documents/embeddings/events), but
  * deliberately hostile —
  *  - one HOT LANGUAGE holding 80 % of documents (selectToBudget /
  *    packSequences group skew),
  *  - one HOT DEDUP BLOCK of near-identical documents (charNgramPairs /
  *    minhashLsh candidate blow-up),
  *  - one BOT USER emitting half of all events in one unbroken burst
  *    (sessionization key skew),
  *  - planted near-duplicate embedding pairs (ANN ground truth).
  *
  * Deterministic: every row is a pure function of its id via
  * SplittableRandom(id-derived seed) inside mapPartitions over
  * spark.range — identical bytes at any parallelism, no RNG state
  * shared across rows. Written once per JVM (pid-keyed tmpdir). */
object StressData {

  val Docs = 50000L
  val HotBlock = 1200L // doc_id < HotBlock: near-identical texts
  val Vecs = 20000L
  val Dim = 64
  val PlantedPairs = 1000 // vec 2k ~ vec 2k+1 for k < PlantedPairs
  val Events = 240000L
  val BotEvents = 120000L // user 0, one unbroken burst

  private val vocab = Array(
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "join", "shard", "codec", "plan", "stage", "task", "skew",
    "limit", "range", "index", "probe", "bucket", "shuffle", "cache", "spill")

  private val built = new scala.collection.concurrent.TrieMap[String, String]()

  /** Generate (once per JVM) and return the corpus dir. */
  def ensure(spark: SparkSession): String = built.getOrElseUpdate("dir", {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-stress-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    documents(spark).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    embeddings(spark).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    events(spark).write.mode("overwrite").parquet(s"$dir/events.parquet")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }))
    dir
  })

  def documents(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(0, Docs, 1, 32).mapPartitions { it =>
      val hotBase = Array.tabulate(40)(j => vocab(j % vocab.length))
      it.map { id =>
        val r = new SplittableRandom(0x9E3779B97F4A7C15L ^ id)
        val text =
          if (id < HotBlock) {
            // hot dedup block: one token perturbed out of 40 — every pair
            // shares ~95 % of its shingles
            val t = hotBase.clone()
            t((id % 40).toInt) = vocab(((id / 40) % vocab.length).toInt)
            t.mkString(" ")
          } else {
            // realistic Zipf-ish vocabulary: a 40-word head plus a long
            // hash-suffixed tail — without the tail EVERY doc is a near
            // duplicate of every other (a 40-word language) and the whole
            // corpus degenerates into one giant dedup block
            val n = 20 + r.nextInt(60)
            (0 until n).map { _ =>
              val w = vocab(r.nextInt(vocab.length))
              if (r.nextInt(4) == 0) s"$w${r.nextInt(10000)}" else w
            }.mkString(" ")
          }
        val lang =
          if (id % 10 < 8) "en" // hot language: 80 % of the corpus
          else Array("de", "fr", "es", "zh").apply((id % 4).toInt)
        val source = if (id % 10 < 3) "bot" else s"src${id % 10}"
        (id, text, lang, source, text.length.toLong)
      }
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  val Clusters = 200 // latent topics: real document embeddings cluster

  /** 10×-the-stress-scale ANN corpus (VERDICT r6 item 6): 200k×64d through
    * auto-nlist ≈ 1789 — past the distributed-Lloyd threshold, so the big
    * gate exercises the executor-side codebook build — with 2,000 planted
    * twin pairs. Same clustered generator, embeddings table only,
    * generated on demand (the main gate stays at 20k). */
  val BigVecs = 200000L
  val BigPlantedPairs = 2000

  def ensureBig(spark: SparkSession): String = built.getOrElseUpdate("bigdir", {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-stress-big-" +
      s"${java.lang.ProcessHandle.current().pid()}"
    embeddingsN(spark, BigVecs, BigPlantedPairs)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }))
    dir
  })

  def embeddings(spark: SparkSession): DataFrame =
    embeddingsN(spark, Vecs, PlantedPairs)

  private def embeddingsN(spark: SparkSession, vecs: Long, planted0: Int): DataFrame = {
    import spark.implicits._
    val (dim, planted, clusters) = (Dim, planted0, Clusters)
    spark.range(0, vecs, 1, 32).mapPartitions { it =>
      it.map { id =>
        val isPlantedDup = id < 2L * planted && (id & 1L) == 1L
        val base: Long = if (id < 2L * planted) id & ~1L else id
        // clustered, not uniform: a topic center plus within-topic noise —
        // the structure ANN indexes exploit in real embedding corpora
        // (uniform-random vectors have no nearest-neighbor structure and
        // defeat every IVF/LSH index equally)
        val cluster = java.lang.Long.remainderUnsigned(base * 0x9E3779B97F4A7C15L, clusters)
        val c = new SplittableRandom(0xC0FFEE ^ cluster)
        val r = new SplittableRandom(0x9E3779B97F4A7C15L ^ base)
        val v = Array.fill(dim)(
          ((c.nextDouble() * 2 - 1) + 0.35 * (r.nextDouble() * 2 - 1)).toFloat)
        if (isPlantedDup) {
          val p = new SplittableRandom(0x9E3779B97F4A7C15L ^ id)
          var i = 0
          while (i < dim) { v(i) += (0.02 * (p.nextDouble() - 0.5)).toFloat; i += 1 }
        }
        (id, v, (cluster % 50).toInt)
      }
    }.toDF("vec_id", "embedding", "label")
  }

  def events(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val botN = BotEvents
    spark.range(0, Events, 1, 32).mapPartitions { it =>
      val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
      it.map { id =>
        val r = new SplittableRandom(0x9E3779B97F4A7C15L ^ id)
        val (user, ts) =
          if (id < botN) {
            // the bot: one event per second, no gap ever exceeds the
            // session threshold — a single 120k-event session on ONE key
            (0L, base + id * 1000L)
          } else {
            val u = 1L + (id - botN) % 2000L
            val seq = (id - botN) / 2000L
            // normal users: bursts of 10 with 40-minute gaps between
            (u, base + u * 7000L + (seq / 10) * 2400_000L + (seq % 10) * 30_000L)
          }
        (id, new java.sql.Timestamp(ts), user,
          Array("view", "click", "buy").apply((id % 3).toInt),
          r.nextDouble() * 100.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }
}
