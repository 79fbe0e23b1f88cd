package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * `saltedJoin` splits every hot left-side key across `salt` sub-keys and
  * replicates the (small-ish) right side once per sub-key: the shuffle for
  * a key with 10^9 rows becomes `salt` balanced partitions instead of one
  * straggler. AQE's skew-join handles moderate skew automatically at
  * runtime; salting is the explicit-plan tool for the extreme tail (and
  * for aggregations, where AQE can't split a key).
  */
object Skew {

  /** Inner equi-join with left-side salting. `right` is replicated `salt`×
    * — size it accordingly (dims, side tables). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)).cast("int"))
    val r = right.crossJoin(
      left.sparkSession.range(0, salt).select(col("id").cast("int").as("__salt")))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * count/sum-style aggregates pre-combine on (key, salt) before the final
    * combine on key — the shuffle never sees a single giant group. */
  def saltedCount(df: DataFrame, key: String, salt: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).cast("long").as("n"))
}
