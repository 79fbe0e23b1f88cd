package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.core.Tables

/** IVF-PQ parameter grid: recall@5 of the ADC-only and ADC+rerank serve
  * paths vs brute force, per (m, ksub, refinePq, rerank). Args: [sfDir]. */
object PqGrid {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.prepare(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01") match {
      case "stress" => StressData.ensure(spark)
      case "stressbig" => StressData.ensureBig(spark)
      case d => d
    }
    val emb = Tables.load(spark, dir, "embeddings").cache()
    val queries = emb.filter(col("vec_id") < 50)
    val k = 5
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding",
      "vec_id", "embedding", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val nTruth = brute.values.map(_.size).sum.toDouble
    val grid: Seq[(Int, Int, Int)] =
      if (args.length > 3) Seq((args(1).toInt, args(2).toInt, args(3).toInt))
      else Seq((8, 16, 3), (8, 16, 8), (8, 64, 8), (16, 16, 8), (16, 64, 8),
        (8, 256, 8), (16, 256, 8))
    for ((m, ksub, refinePq) <- grid) {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft-pqgrid-$m-$ksub-$refinePq"
      val t0 = System.nanoTime()
      Similarity.buildIvfPqIndex(emb, path, "vec_id", "embedding",
        m = m, ksub = ksub, refinePq = refinePq)
      val tBuild = (System.nanoTime() - t0) / 1e9
      for (rerank <- Seq(0, 20, 40)) {
        val t1 = System.nanoTime()
        val ann = Similarity.ivfPqTopK(path, queries, "vec_id", "embedding",
          k = k, nprobe = 32, rerank = rerank,
          exact = emb, exactId = "vec_id", exactVec = "embedding")
          .collect().map(r => r.getLong(0) -> r.getLong(1))
        val tServe = (System.nanoTime() - t1) / 1e9
        val hits = ann.count { case (q, n) => brute.get(q).exists(_.contains(n)) }
        println(f"m=$m%3d ksub=$ksub%4d refinePq=$refinePq%2d rerank=$rerank%3d " +
          f"recall=${hits / nTruth}%.3f build=$tBuild%.2fs serve=$tServe%.2fs")
      }
    }
    spark.stop()
  }
}
