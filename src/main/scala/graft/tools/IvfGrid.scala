package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Similarity

/** Scratch grid for ivfTopK (nlist, nprobe, replicate): recall@k vs brute
  * force; scan fraction ~ nprobe*replicate/nlist (balanced lists). */
object IvfGrid {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.prepare(spark)
    // "stress" = the adversarial 10x-sf0.1 corpus; "stressbig" = the
    // 200k x 64d ANN corpus (both generated on demand)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01") match {
      case "stress" => StressData.ensure(spark)
      case "stressbig" => StressData.ensureBig(spark)
      case d => d
    }
    val emb = Tables.load(spark, dir, "embeddings").cache()
    val queries = emb.filter(col("vec_id") < 50)
    val k = 10
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding",
      "vec_id", "embedding", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val grid: Seq[(Int, Int, Int)] =
      if (args.length > 1) Seq((args(1).toInt, args(2).toInt, args(3).toInt))
      else Seq((16, 4, 1), (16, 4, 2), (32, 8, 1), (64, 16, 1), (64, 8, 1),
        (64, 16, 2), (128, 32, 1), (128, 16, 1), (32, 8, 2), (64, 32, 1))
    for ((nlist, nprobe, replicate) <- grid) {
      val t0 = System.nanoTime()
      val ann = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        "vec_id", "embedding", k, nlist = nlist, nprobe = nprobe, replicate = replicate)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val sec = (System.nanoTime() - t0) / 1e9
      val rec = brute.keys.toSeq.map { q =>
        ann.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / k
      }.sum / brute.size
      val scanEst = nprobe.toDouble * replicate / nlist
      println(f"nlist=$nlist%3d nprobe=$nprobe%2d repl=$replicate  recall=$rec%.3f  ~scan=$scanEst%.3f  ${sec}%.2fs")
    }
    spark.stop()
  }
}
