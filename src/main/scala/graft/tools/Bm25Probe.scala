package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.RetrievalIndex
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.prepare(spark)
    val dir = StressData.ensure(spark)
    val docs = Tables.load(spark, dir, "documents")
    val rPath = s"${System.getProperty("java.io.tmpdir")}/bm25probe-${ProcessHandle.current().pid()}"
    RetrievalIndex.build(docs, "doc_id", "text", rPath)
    val queries = docs.filter(col("doc_id") % 500 === 7)
    val (qterms, pruned, n, totalT) = RetrievalIndex.prunedFor(queries, "doc_id", "text", rPath)
    val matched = graft.core.GraftSession.pin(
      pruned.join(broadcast(qterms.select(col("term")).distinct()), Seq("term")))
    val dfTable = matched.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qlogScale = 16L * (63 - java.lang.Long.numberOfLeadingZeros(graft.operators.Pipeline.Bm25Scale))
    val qti = dfTable.join(broadcast(qterms), "term")
      .withColumn("__r", expr(
        s"${graft.operators.Pipeline.Bm25Scale}L + (2 * ${n}L - 2 * df + 1) * " +
          s"${graft.operators.Pipeline.Bm25Scale}L DIV (2 * df + 1)"))
      .withColumn("idf_q", expr(graft.operators.Pipeline.qlog2Sql("__r")) - lit(qlogScale))
      .filter(col("idf_q") > 0)
      .select(col("query_id"), col("term"), col("idf_q"))
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val r = f
        println(f"PROBE $label rep$i rows=$r in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val satCol = expr(s"(44 * tf * ${totalT}L * 16) DIV " +
      s"(20 * tf * ${totalT}L + 6 * ${totalT}L + 18 * dl * ${n}L)")
    // V0: current shape — sat computed per fanout row, groupBy needs exchange
    time("V0-current") {
      matched.join(broadcast(qti), "term")
        .withColumn("__sc", col("idf_q") * satCol)
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("__sc")).cast("long").as("score"))
        .filter(col("score") > 0).count()
    }
    // V1: sat precomputed on matched (1.2M rows) before the fanout
    time("V1-satEarly") {
      matched.withColumn("__sat", satCol)
        .join(broadcast(qti), "term")
        .withColumn("__sc", col("idf_q") * col("__sat"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("__sc")).cast("long").as("score"))
        .filter(col("score") > 0).count()
    }
    // V2: repartition matched by doc_id before fanout — the groupBy's
    // ClusteredDistribution(query_id, doc_id) is satisfied by
    // HashPartitioning(doc_id), so the 70M fanout rows never shuffle
    time("V2-docPart") {
      matched.withColumn("__sat", satCol)
        .repartition(cpus.toInt, col("doc_id"))
        .join(broadcast(qti), "term")
        .withColumn("__sc", col("idf_q") * col("__sat"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("__sc")).cast("long").as("score"))
        .filter(col("score") > 0).count()
    }
    // V3: V2 + higher parallelism for the agg maps
    time("V3-docPart128") {
      matched.withColumn("__sat", satCol)
        .repartition(4 * cpus.toInt, col("doc_id"))
        .join(broadcast(qti), "term")
        .withColumn("__sc", col("idf_q") * col("__sat"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("__sc")).cast("long").as("score"))
        .filter(col("score") > 0).count()
    }
    RetrievalIndex.drop(spark, rPath)
    spark.stop()
  }
}
