package graft.tools

import graft.core.GraftSession
import graft.queries.Catalog

/** Dump formatted physical plans for selected queries — plan-quality audit
  * (pushdown, broadcast, whole-stage codegen spans). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args(1).split(",").toSet
      else Set("q01_pricing_summary", "q02_filter_project", "q03_revenue_by_nation",
        "src_redis_zset_pushdown", "src_mongo_find_pushdown")
    // "exec" as arg 3: run the query first and print the FINAL adaptive
    // plan — shows AQE join conversions and reused exchanges/stages that
    // the pre-execution plan can't.
    val exec = args.length > 2 && args(2) == "exec"
    Catalog.all.filter(q => names.contains(q.name)).foreach { q =>
      println(s"\n===== ${q.name} =====")
      val df = q.fn(spark, dir)
      if (exec) df.count()
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
