package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for, expressed as
  * single-shuffle declarative plans.
  *
  * The naive formulation of both — a theta-join on
  * `key = key AND ts range` — degenerates to a per-key cross product
  * (BroadcastNestedLoopJoin or a skewed sort-merge). These operators keep
  * the work proportional to the input: as-of is one shuffle + sort per key,
  * range-count is an equi-join on (key, time bin).
  */
object Temporal {

  /** As-of join: for each left row, the greatest `rightTs` of a right row
    * with the same key and `rightTs <= leftTs` (null when none).
    *
    * Plan shape: union both sides tagged, one window
    * (`partitionBy key orderBy (ts, side)` with right rows sorting first at
    * equal ts, running `last(rightTs, ignoreNulls)`) — a single hash
    * shuffle on the key and one sort, regardless of how many right rows
    * precede each left row. The matched value IS its own sort key, so ties
    * among equal-ts right rows cannot make the result nondeterministic.
    *
    * At 100 TB this is the only as-of shape that survives: per-key history
    * length never multiplies the shuffle (compare the theta-join, which
    * materializes every (left, earlier-right) pair before aggregating).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      matchedCol: String): DataFrame = {
    val reserved = Set("__k", "__ts", "__side", "__rts", "__p")
    require(!left.columns.exists(reserved), s"left columns may not use ${reserved.mkString("/")}")
    require(!left.columns.contains(matchedCol), s"left already has a '$matchedCol' column")
    val payload = struct(left.columns.map(col): _*)
    val l = left.select(col(key).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"), lit(null).cast(left.schema(leftTs).dataType).as("__rts"),
      payload.as("__p"))
    val payloadType = l.schema("__p").dataType
    val r = right.select(col(key).as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__side"), col(rightTs).as("__rts"),
      lit(null).cast(payloadType).as("__p"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(matchedCol, last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__p.*"), col(matchedCol))
  }

  /** Per-left-row count of right rows with the same key and
    * `rightTs ∈ [leftTs - window, leftTs)` — a sliding "recent activity"
    * range join.
    *
    * Plan shape: bin both sides into `window`-wide time buckets; a right
    * row can only qualify from the left row's own bucket or the one before
    * it, so the left side probes exactly two (key, bin) buckets through a
    * plain equi-join, and the exact range predicate runs as a residual
    * filter on the matched rows. Left rows with no match keep count 0 via
    * the final left join. The bin key bounds the join fan-out by actual
    * temporal locality — never a per-key cross product.
    *
    * @param leftId a UNIQUE left column the per-row count groups on. */
  def rangeCountBinned(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftId: String,
      leftTs: String,
      rightTs: String,
      windowMs: Long,
      countCol: String): DataFrame = {
    require(windowMs > 0, "window must be positive")
    val reserved = Set("__lus", "__lbin", "__bin", "__rk", "__rus", "__rbin", "__gid")
    require(!left.columns.exists(reserved) && countCol != leftId,
      s"left columns may not use ${reserved.mkString("/")}")
    // compare at MICROsecond precision (full timestamp resolution — a
    // millisecond floor would misorder sub-ms neighbors); integral DIV
    // binning is exact at bucket boundaries (fp division could drift a
    // boundary microsecond into the wrong bin)
    val winUs = windowMs * 1000L
    val l = left
      .withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__lbin", expr(s"__lus DIV $winUs"))
      .withColumn("__bin", explode(array(col("__lbin"), col("__lbin") - 1)))
    val r = right.select(col(key).as("__rk"), unix_micros(col(rightTs)).as("__rus"))
      .withColumn("__rbin", expr(s"__rus DIV $winUs"))
    val counts = l.join(r,
        l(key) === col("__rk") && col("__bin") === col("__rbin") &&
          col("__rus") >= col("__lus") - winUs && col("__rus") < col("__lus"))
      .groupBy(col(leftId).as("__gid"))
      .agg(count(lit(1)).as(countCol))
    left.join(counts, left(leftId) === col("__gid"), "left")
      .drop("__gid")
      .na.fill(0, Seq(countCol))
  }

  /** Row-returning variant of [[rangeCountBinned]]: inner-join each left
    * row to every right row with `rightTs` in [leftTs - window, leftTs),
    * same key. Identical two-bucket probe plan — each right row's bin
    * equals the left row's bin or the one before it, exactly one of the
    * two exploded probes, so no pair ever duplicates. Right-side columns
    * (beyond the key) are carried through under their own names; rename
    * before calling on collisions. */
  def rangeJoinBinned(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      windowMs: Long): DataFrame = {
    require(windowMs > 0, "window must be positive")
    val reserved = Set("__lus", "__lbin", "__bin", "__rk", "__rus", "__rbin")
    require(!(left.columns ++ right.columns).exists(reserved),
      s"columns may not use ${reserved.mkString("/")}")
    val overlap = (right.columns.toSet - key).intersect(left.columns.toSet)
    require(overlap.isEmpty, s"rename right columns colliding with left: $overlap")
    val winUs = windowMs * 1000L
    val l = left
      .withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__lbin", expr(s"__lus DIV $winUs"))
      .withColumn("__bin", explode(array(col("__lbin"), col("__lbin") - 1)))
    val rExtra = right.columns.filterNot(_ == key).map(col)
    val r = right.select(
      (Seq(col(key).as("__rk"), unix_micros(col(rightTs)).as("__rus")) ++ rExtra): _*)
      .withColumn("__rbin", expr(s"__rus DIV $winUs"))
    l.join(r,
        l(key) === col("__rk") && col("__bin") === col("__rbin") &&
          col("__rus") >= col("__lus") - winUs && col("__rus") < col("__lus"))
      .drop("__lus", "__lbin", "__bin", "__rk", "__rus", "__rbin")
  }

  /** Interval-overlap join (intervals × intervals — the family member
    * [[asofJoin]] and [[rangeJoinBinned]] don't cover): rows match when
    * [lStart, lEnd] ∩ [rStart, rEnd] ≠ ∅. Each interval explodes to its
    * `binMs`-wide bins, pairs meet on a bin equi-join (overlapping
    * intervals ALWAYS share the bin containing any intersection point —
    * full recall), the exact predicate filters false bin collisions, and
    * the pair is kept ONLY in the canonical bin holding
    * max(lStart, rStart) — exactly one emission per pair, no distinct
    * pass. Work scales with interval-length/binMs fan-out × bin
    * collisions, never |L|·|R|; size binMs near the typical interval
    * length. All columns are epoch-millis longs.
    *
    * SKEW BOUND: with `leftKey`/`rightKey` unset the join key is the bin
    * ALONE, so per-bin work is |L_bin|·|R_bin| on one task — fine when
    * per-bin concurrency is bounded (the global-timeline case: machine
    * maintenance windows, release trains), a scale-killer when a peak
    * hour concentrates thousands of concurrent intervals. At corpus
    * scale ALWAYS pass the natural blocking pair (host, user, region,
    * …): the key joins AHEAD of the bin, so a hot bin shatters across
    * keys exactly as [[rangeJoinBinned]]'s does — the stress suite gates
    * this shape on a single-bin pileup. Key columns must be named
    * differently on the two sides (rename on collision, like every
    * other right-side column). */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      binMs: Long,
      leftKey: Option[String] = None,
      rightKey: Option[String] = None): DataFrame = {
    require(binMs > 0, "binMs must be positive")
    require(leftKey.isDefined == rightKey.isDefined,
      "pass both leftKey and rightKey, or neither")
    val reserved = Set("__bin", "__rbin")
    require(!(left.columns ++ right.columns).exists(reserved),
      s"columns may not use ${reserved.mkString("/")}")
    val overlap = right.columns.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"rename right columns colliding with left: $overlap")
    val l = left.withColumn("__bin", explode(sequence(
      expr(s"$lStart DIV $binMs"), expr(s"$lEnd DIV $binMs"))))
    val r = right.withColumn("__rbin", explode(sequence(
      expr(s"$rStart DIV $binMs"), expr(s"$rEnd DIV $binMs"))))
    val keyCond = (leftKey, rightKey) match {
      case (Some(a), Some(b)) => col(a) === col(b)
      case _ => lit(true)
    }
    l.join(r, keyCond && col("__bin") === col("__rbin") &&
        col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bin") === expr(s"greatest($lStart, $rStart) DIV $binMs"))
      .drop("__bin", "__rbin")
  }
}
