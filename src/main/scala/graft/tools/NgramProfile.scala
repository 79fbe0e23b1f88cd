package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dedup

/** Scratch profiler for the stress-corpus charNgramPairs cost: times the
  * operator and counts the PPJoin candidate instances on the hot block to
  * attribute where the stress-line seconds go. Not part of any gate. */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.prepare(spark)
    val dir = StressData.ensure(spark)
    val docs = Tables.load(spark, dir, "documents").filter(col("doc_id") < 12000)
    docs.count()

    var t0 = System.nanoTime()
    val n = Dedup.charNgramPairs(docs, "doc_id", "text", "lang", threshold = 0.8).count()
    println(f"NGPROF charngram_full     ${(System.nanoTime() - t0) / 1e9}%.2fs pairs=$n")

    // hot-block-only legs: rebuild the internal (blk, doc_id, sh, n) shape
    val sh = docs.filter(col("text").isNotNull)
      .select(col("lang").as("blk"), col("doc_id").cast("long").as("doc_id"),
        sort_array(transform(graft.functions.char_shingles(col("text"), 5),
          g => xxhash64(g))).as("sh"))
      .withColumn("n", size(col("sh")))
    val hotBlk = docs.groupBy(col("lang")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 4096).select(col("lang")).collect().map(_.getString(0))
    println(s"NGPROF hot_blocks         ${hotBlk.mkString(",")}")
    val big = sh.filter(col("blk").isin(hotBlk: _*))
    println(s"NGPROF big_rows           ${big.count()}")

    t0 = System.nanoTime()
    val dens = Dedup.blockDensity(big, 9600L, 0.8)
    println(f"NGPROF density_probe      ${(System.nanoTime() - t0) / 1e9}%.2fs d=$dens%.4f")

    t0 = System.nanoTime()
    val tri = Dedup.triangleBlockPairs(big, 0.8, 9600L).count()
    println(f"NGPROF triangle_hot       ${(System.nanoTime() - t0) / 1e9}%.2fs pairs=$tri")

    t0 = System.nanoTime()
    val cand = Dedup.prefixCandidates(big, 0.8).count()
    println(f"NGPROF prefix_candidates  ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$cand")

    t0 = System.nanoTime()
    val pp = Dedup.prefixFilteredPairsForProfile(big, 0.8).count()
    println(f"NGPROF ppjoin_verified    ${(System.nanoTime() - t0) / 1e9}%.2fs pairs=$pp")
    spark.stop()
  }
}
