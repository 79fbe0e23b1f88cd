package graft.tools

import org.apache.spark.sql.SparkSession

/** Within-session rep-stability harness: run the named catalog queries N
  * times back-to-back in ONE session and print each rep's seconds — the
  * measurement that exposed the round-7 pin leak (q81 reps ramping
  * 1.5 s → 13 s in `bench_detail.json` while min-of-reps hid it).
  * Usage: RepTimer <sfDir> <comma-query-names> [reps=5] */
object RepTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.prepare(spark)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cached = spark.sparkContext.getRDDStorageInfo.length
      println(s"$n: ${times.map(t => f"$t%.2f").mkString("[", ", ", "]")} " +
        s"swing=${f"${times.max / times.min}%.2f"}x cachedRdds=$cached")
    }
    spark.stop()
  }
}
