package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Similarity

/** Scratch grid-search for lshTopK (tables, planes, probeBits): prints
  * mean recall@k vs brute force and the candidate scan fraction. */
object LshGrid {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.prepare(spark)
    val emb = Tables.load(spark, dir, "embeddings").cache()
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < 50)
    val k = 10
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding",
      "vec_id", "embedding", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val nq = brute.size
    val grid: Seq[(Int, Int, Int)] =
      if (args.length > 1) // single config, 3 reps (min = steady-state time)
        Seq.fill(3)((args(1).toInt, args(2).toInt, args(3).toInt))
      else Seq((160, 16, 6), (192, 16, 6), (256, 16, 6), (160, 15, 5),
        (192, 15, 5), (192, 14, 4), (160, 14, 4), (224, 16, 5))
    for ((tables, planes, probeBits) <- grid) {
      val t0 = System.nanoTime()
      val ann = Similarity.lshTopK(queries, emb, "vec_id", "embedding",
        "vec_id", "embedding", k, planes = planes, tables = tables,
        probeBits = probeBits)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val sec = (System.nanoTime() - t0) / 1e9
      val rec = brute.keys.toSeq.map { q =>
        ann.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / k
      }.sum / nq
      // scan fraction: distinct candidate pairs / (nq * n)
      val cand = Similarity.lshCandidateCount(queries, emb, "vec_id", "embedding",
        "vec_id", "embedding", planes = planes, tables = tables, probeBits = probeBits)
      val frac = cand.toDouble / (nq.toDouble * n)
      println(f"tables=$tables%2d planes=$planes%2d probeBits=$probeBits  recall=$rec%.3f  scan=$frac%.3f  ${sec}%.2fs")
    }
    spark.stop()
  }
}
