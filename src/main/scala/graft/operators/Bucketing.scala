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

  /** Persist a DataFrame as a bucketed+sorted table.
    *
    * Idempotent against a stale managed location: a fresh in-memory catalog
    * (new JVM, same warehouse dir) does not know the table, but its previous
    * location still exists and `saveAsTable` refuses to reuse it — so drop
    * the table AND clear the location first. Matters for re-runs after
    * failures on a shared warehouse, not just tests. */
  /** Drop a managed table AND clear its default location — `saveAsTable`
    * refuses to reuse a leftover location from a previous JVM even after
    * the (in-memory) catalog forgot the table. Shared by [[writeBucketed]]
    * and the index-rebuild staging/swap paths. */
  def dropTableAndLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
  }

  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    dropTableAndLocation(spark, table)
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys (exchange-free when both
    * sides share bucket count and keys). */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)

  /** True if the physical plan contains no shuffle exchange. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")

  /** Small-file compaction — the table-maintenance op every long-lived
    * 100 TB dataset needs (streaming sinks and per-epoch appends leave
    * thousands of KB-sized files; a scan then pays one task + one open
    * per file). Rewrites the directory into ⌈totalBytes/targetBytes⌉
    * files via `coalesce` — NO shuffle: uniformly small inputs combine
    * into evenly sized outputs, and the rewrite cost is one read + one
    * write. Staged into a `.compact.tmp` sibling and swapped in only
    * after the write commits, so a failure BEFORE the swap leaves the
    * original intact, and a failure between the two swap renames rolls
    * the original back. The swap itself is two directory renames, NOT
    * atomic: a concurrent reader listing the path in that window fails
    * its scan (and must retry) — schedule compaction when the dataset
    * has no concurrent readers, or front it with a catalog/view flip;
    * single-directory-rename atomicity needs a table format. Returns the
    * new file count. */
  def compact(spark: SparkSession, path: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.listStatus(p).filter(_.getPath.getName.startsWith("part-"))
      .map(_.getLen).sum
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(path + ".compact.old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(p, old), s"compaction swap failed: $p -> $old")
    if (!fs.rename(tmp, p)) {
      // roll the original back so the dataset path never stays missing;
      // only if THAT also fails is manual recovery (.compact.old) needed
      val restored = fs.rename(old, p)
      throw new IllegalStateException(
        s"compaction swap failed: $tmp -> $p" +
          (if (restored) " (original restored)"
           else s" AND rollback failed — data is at $old"))
    }
    fs.delete(old, true)
    n
  }

  /** Z-order clustered parquet writes — the MULTI-column data-skipping
    * lever (bucketing co-locates one join key; Z-order clusters two
    * filter columns at once). Each column is linearly scaled into a
    * bounded non-negative range from its (min, max) — ONE tiny aggregate,
    * two literals — and the Morton interleave of the scaled values
    * becomes the layout key: `repartitionByRange` + in-partition sort by
    * it writes files whose parquet row-group min/max are tight on BOTH
    * columns, so a selective filter on either (or both) skips whole row
    * groups at the scan. At 100 TB this turns "scan the fact table" into
    * "read the few row groups whose rectangle intersects the predicate"
    * — no index service, no table format, just layout. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      nFiles: Int): Unit = {
    import org.apache.spark.sql.functions._
    require(nFiles > 0, "nFiles must be positive")
    val b = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).collect()(0)
    if (b.isNullAt(0) || b.isNullAt(2)) {
      // empty input (or all-null layout columns): min/max aggregates are
      // NULL — there is nothing to cluster; write the (empty) frame
      // instead of dying on an opaque NPE below
      df.write.mode("overwrite").parquet(path)
      return
    }
    val scaleMax = (1L << graft.functions.Zorder.BitsPerDim) - 1
    def scaled(c: String, lo: Double, hi: Double) =
      if (hi <= lo) lit(0L)
      else least(lit(scaleMax), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * scaleMax)
          .cast("long")))
    val zv = graft.functions.morton_interleave(
      scaled(colA, b.getDouble(0), b.getDouble(1)),
      scaled(colB, b.getDouble(2), b.getDouble(3)))
    df.withColumn("__z", zv)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
