package graft.tools

/** Run the stress bench line standalone (outside a full Bench run):
  * `sbt "runMain graft.tools.StressLine"`. */
object StressLine {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus, "graft-stress-line")
    println(StressBench.line(spark))
    spark.stop()
  }
}
