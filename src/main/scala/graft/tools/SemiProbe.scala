package graft.tools
import org.apache.spark.sql.functions._
object SemiProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4)
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val sh = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        length(col("text")).as("sh"))
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    val j = sh.join(ids, Seq("doc_id"), "left_semi")
    println(j.queryExecution.optimizedPlan.treeString.take(2000))
    spark.stop()
  }
}
