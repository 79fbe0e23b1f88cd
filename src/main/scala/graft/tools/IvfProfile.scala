package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q84 components: times the inline ivfTopK at
  * explicit vs auto nlist, and the served/truth/invariant legs separately,
  * to attribute the round-6 q84 delta. Not part of any gate. */
object IvfProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.prepare(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count()
    val queries = emb.filter(col("vec_id") < 50)

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 8).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"IVFPROF $label%-24s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    time("inline_nlist128") {
      graft.operators.Similarity.ivfTopK(queries, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5, nlist = 128).count()
    }
    time("inline_auto") {
      graft.operators.Similarity.ivfTopK(queries, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5).count()
    }
    time("brute_truth") {
      graft.operators.Similarity.bruteForceTopK(queries, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5).count()
    }
    val idx = s"${System.getProperty("java.io.tmpdir")}/ivfprof-${java.lang.ProcessHandle.current().pid()}"
    val tb0 = System.nanoTime()
    graft.operators.Similarity.buildIvfIndex(emb, idx, "vec_id", "embedding")
    println(f"IVFPROF build                    once=${(System.nanoTime()-tb0)/1e9}%.3f")
    time("served") {
      graft.operators.Similarity.ivfTopKFromIndex(
        idx, queries, "vec_id", "embedding", k = 5).count()
    }
    val served = graft.operators.Similarity.ivfTopKFromIndex(
      idx, queries, "vec_id", "embedding", k = 5)
    val inline = graft.operators.Similarity.ivfTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5)
    time("exceptAll_pair") {
      served.exceptAll(inline).agg(count(lit(1)).as("a"))
        .crossJoin(inline.exceptAll(served).agg(count(lit(1)).as("b"))).count()
    }
    spark.stop()
  }
}
