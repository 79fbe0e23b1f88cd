package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed, co-located joins — the shuffle-elimination lever for repeated
  * large-fact joins at 100 TB.
  *
  * Writing both sides bucketed (and sorted) by the join key lets Spark plan
  * a sort-merge join with NO exchange on either side: each bucket pair is
  * joined locally. At 100 TB the exchange this avoids is the dominant cost
  * of a fact-fact join; bucket count should be sized so a bucket fits an
  * executor core (e.g. 4096 buckets for a 10 TB fact).
  */
object Bucketing {

  /** Persist a DataFrame as a bucketed+sorted table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys (exchange-free when both
    * sides share bucket count and keys). */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)

  /** True if the physical plan contains no shuffle exchange. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
