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

  /** The dataset's live directory: the highest committed generation under
    * `path` ([[graft.core.GenDir]]) when [[compact]] has ever run, else
    * the flat `path` itself (a dataset that never compacted). Readers of
    * a compactable dataset resolve through this. */
  def current(spark: SparkSession, path: String): String =
    graft.core.GenDir.resolve(spark, path).getOrElse(path)

  /** Small-file compaction — the table-maintenance op every long-lived
    * 100 TB dataset needs (streaming sinks and per-epoch appends leave
    * thousands of KB-sized files; a scan then pays one task + one open
    * per file). Rewrites the live data into ⌈totalBytes/targetBytes⌉
    * files via `coalesce` — NO shuffle: uniformly small inputs combine
    * into evenly sized outputs, and the rewrite cost is one read + one
    * write. Swap discipline: [[graft.core.GenDir]] — the fold is staged
    * as the next generation beside the live one and published with one
    * atomic sentinel create, so a concurrent reader (resolving through
    * [[current]]) never fails mid-scan and never sees a mixed state;
    * crashed-compaction debris is swept at the next commit. The FIRST
    * compaction of a flat directory migrates it: the flat part files are
    * folded into generation 0 and then deleted — a reader that opened the
    * flat files in that one migration window should retry through
    * [[current]] (every later compaction is reader-atomic). Returns the
    * new file count. */
  def compact(spark: SparkSession, path: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    import graft.core.GenDir
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = current(spark, path)
    val srcP = new org.apache.hadoop.fs.Path(src)
    val total = fs.listStatus(srcP).filter(_.getPath.getName.startsWith("part-"))
      .map(_.getLen).sum
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val gen = GenDir.next(spark, path)
    spark.read.parquet(src).coalesce(n)
      .write.mode("overwrite").parquet(GenDir.genPath(path, gen))
    GenDir.commit(spark, path, gen)
    // sweep leftover FLAT part files under the root — after the migration
    // compaction, but also on every later one: a crash between a
    // migration's commit and its sweep must not leave the stale flat copy
    // (and a legacy direct reader on it) behind forever
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter { s =>
        val name = s.getPath.getName
        s.isFile && (name.startsWith("part-") || name == "_SUCCESS")
      }
      .foreach(s => fs.delete(s.getPath, false))
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
