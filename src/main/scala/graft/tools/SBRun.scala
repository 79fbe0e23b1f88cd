package graft.tools
object SBRun {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    println(StressBench.line(spark))
    spark.stop()
  }
}
