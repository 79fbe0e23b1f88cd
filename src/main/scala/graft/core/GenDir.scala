package graft.core

import org.apache.spark.sql.SparkSession

/** Committed-generation directories — ONE swap discipline for every
  * path-backed persisted artifact (IVF index, url claim index, compacted
  * datasets), replacing the round-≤11 two-rename sibling swap whose window
  * failed concurrent readers (VERDICT r11 item 3).
  *
  * Layout under a root path:
  * {{{
  *   root/_g0/...data...   root/_g0/_COMMITTED
  *   root/_g1/...data...   root/_g1/_COMMITTED
  * }}}
  *
  * Invariants:
  *  - a generation dir is IMMUTABLE once committed (maintenance appends —
  *    e.g. IVF delta batches — are part of a generation's documented
  *    mutable tail, never a rewrite of existing files);
  *  - the live generation is the HIGHEST gen number holding the
  *    `_COMMITTED` sentinel — the sentinel is one `fs.create` (atomic on
  *    HDFS/posix, a single PUT on object stores), written only after every
  *    data file of the generation is fully committed, so a resolver can
  *    never adopt a half-written generation (this also closes the
  *    object-store hole of dir-existence == committed: Spark's parquet
  *    jobs create their output dirs before data commits);
  *  - rebuild/compaction stages the next generation BESIDE the live one
  *    and publishes with that single sentinel create — the live data never
  *    moves, so a reader mid-scan keeps its files and a reader resolving
  *    mid-publish gets either generation, both complete. No renames, no
  *    rollback window, no post-swap cache refresh (new generations are new
  *    paths — the session FileStatusCache cannot go stale);
  *  - on publish, committed generations OLDER than the immediately
  *    previous one are deleted (grace = one generation: a scan survives
  *    one full rebuild that completes mid-scan; two is the documented
  *    envelope), and UNCOMMITTED debris below the new generation (a
  *    crashed rebuild) is removed — crash recovery is automatic, no
  *    `.old`/`.tmp` sibling probing;
  *  - generation dirs are `_`-prefixed, so an accidental
  *    `spark.read.parquet(root)` sees an empty dataset instead of a
  *    silent union of generations.
  */
object GenDir {

  val Prefix = "_g"
  val CommitMarker = "_COMMITTED"

  /** Committed generations kept BEHIND the live one on publish. */
  val GraceKeep = 1

  /** Conf key for the TIME leg of the grace window (spark.-prefixed —
    * spark-submit drops non-spark conf keys): a committed generation
    * younger than this many milliseconds is kept on publish even when
    * the count rule would drop it. The count rule alone protects a scan
    * across ONE rebuild; a multi-hour full-corpus scan racing two
    * back-to-back compactions would lose its files mid-flight — the one
    * residual swap hazard. Default generous (6 h — longer than any sane
    * scan); sweep-asserting tests pin it to 0. */
  val MaxScanAgeKey = "spark.graft.maxScanAgeMs"
  val DefaultMaxScanAgeMs: Long = 6L * 3600L * 1000L

  /** Cap on generations the TIME leg may keep (newest-first by commit
    * time), `spark.graft.maxTimeKeptGens`. Without it a stream that
    * compacts every few minutes (q156-style UrlIndex folds, in-stream
    * registry/minhash maintenance) would retain dozens of full index
    * copies inside the 6 h window — the window bounds scan AGE, this
    * bounds disk AMPLIFICATION. The storage envelope is
    * `(1 + GraceKeep + cap)` live copies worst-case; the protection
    * envelope shrinks to `cap × compaction cadence` when the cadence is
    * faster than `maxScanAgeMs / cap` — size the cap to the longest scan
    * you run against the most compaction-happy artifact. */
  val MaxTimeKeptKey = "spark.graft.maxTimeKeptGens"
  val DefaultMaxTimeKeptGens: Int = 4

  private[graft] def maxScanAgeMs(spark: SparkSession): Long =
    spark.conf.get(MaxScanAgeKey, DefaultMaxScanAgeMs.toString).toLong

  private[graft] def maxTimeKeptGens(spark: SparkSession): Int =
    spark.conf.get(MaxTimeKeptKey, DefaultMaxTimeKeptGens.toString).toInt

  private def fsOf(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def genPath(root: String, gen: Int): String = s"$root/$Prefix$gen"

  /** All generation numbers under the root, with their committed flag
    * and commit time (the `_COMMITTED` sentinel's mtime; 0 when
    * uncommitted) — one listing plus one status probe per gen dir. */
  private def gens(spark: SparkSession, root: String): Seq[(Int, Boolean, Long)] = {
    val fs = fsOf(spark, root)
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap { s =>
        val n = s.getPath.getName
        if (!n.startsWith(Prefix)) None
        else n.stripPrefix(Prefix).toIntOption.map { g =>
          val marker = new org.apache.hadoop.fs.Path(s.getPath, CommitMarker)
          val at =
            try fs.getFileStatus(marker).getModificationTime
            catch { case _: java.io.FileNotFoundException => -1L }
          (g, at >= 0L, math.max(at, 0L))
        }
      }
  }

  /** The live (highest committed) generation's path, if any. */
  def resolve(spark: SparkSession, root: String): Option[String] = {
    val committed = gens(spark, root).collect { case (g, true, _) => g }
    if (committed.isEmpty) None else Some(genPath(root, committed.max))
  }

  def resolveRequired(spark: SparkSession, root: String): String =
    resolve(spark, root).getOrElse(throw new IllegalStateException(
      s"no committed generation under $root — not a graft generation dir " +
        "(or its build never committed)"))

  /** The next generation number to stage (one past everything present,
    * committed or debris — debris below is cleaned at commit). */
  def next(spark: SparkSession, root: String): Int = {
    val all = gens(spark, root).map(_._1)
    if (all.isEmpty) 0 else all.max + 1
  }

  /** The generations a publish of `newGen` must delete. KEEP is the OR
    * of two rules: the newest [[GraceKeep]] committed generations below
    * `newGen`, selected by RECENCY, not by number (gen numbers need not
    * be dense when debris was staged in between) — and the newest (by
    * commit time) at most `maxTimeKept` committed generations whose
    * commit is younger than `maxScanAgeMs` (the time leg: a reader whose
    * scan outlives two back-to-back rebuilds keeps its files as long as
    * the scan is shorter than the configured age; the cap bounds the
    * disk amplification a fast-compacting stream would otherwise build
    * up inside the window — see [[MaxTimeKeptKey]]). Uncommitted debris
    * below `newGen` always drops. Pure selection, shared by the
    * path-backed commit here and the catalog-table minhash variant
    * ([[graft.operators.Dedup]]), so the grace policy can never diverge
    * between the two index layouts. */
  def toDrop(all: Seq[(Int, Boolean, Long)], newGen: Int,
      now: Long, maxScanAgeMs: Long,
      maxTimeKept: Int = DefaultMaxTimeKeptGens): Seq[Int] = {
    val kept = all.collect { case (g, true, _) if g < newGen => g }
      .sorted.takeRight(GraceKeep).toSet
    val timeKept = all.collect {
        case (g, true, at) if g < newGen && !kept.contains(g) &&
          now - at < maxScanAgeMs => (at, g)
      }.sorted.takeRight(math.max(maxTimeKept, 0)).map(_._2).toSet
    all.collect {
      case (g, true, _) if g < newGen && !kept.contains(g) &&
        !timeKept.contains(g) => g
      case (g, false, _) if g < newGen => g
    }
  }

  /** Publish generation `gen`: create its `_COMMITTED` sentinel (the
    * single atomic step readers key on), then delete the [[toDrop]]
    * generations. Call only after every data file under the generation
    * dir is fully written. */
  def commit(spark: SparkSession, root: String, gen: Int): Unit = {
    val fs = fsOf(spark, root)
    val marker = new org.apache.hadoop.fs.Path(genPath(root, gen), CommitMarker)
    if (!fs.exists(marker)) fs.create(marker, false).close()
    val all = gens(spark, root)
    val now = System.currentTimeMillis()
    val ageMs = maxScanAgeMs(spark)
    val cap = maxTimeKeptGens(spark)
    val drops = toDrop(all, gen, now, ageMs, cap)
    // loud when the CAP (not age) evicts a committed generation still
    // inside the scan window: a stream compacting faster than
    // maxScanAgeMs/cap has silently shrunk its reader-protection envelope
    // to cap × cadence — the operator should either raise the cap or
    // accept the shorter window knowingly (r14 ADVICE)
    val commitAt = all.collect { case (g, true, at) => g -> at }.toMap
    val capDropped = drops.filter(g =>
      commitAt.get(g).exists(at => now - at < ageMs))
    if (capDropped.nonEmpty)
      System.err.println(s"[graft] GenDir $root: dropping committed " +
        s"generation(s) ${capDropped.sorted.mkString(",")} still inside the " +
        s"${ageMs} ms scan window — $MaxTimeKeptKey=$cap caps time-kept " +
        "generations; scans longer than cap x compaction cadence can lose " +
        "files mid-flight (raise the cap or slow the compaction cadence)")
    drops.foreach { g =>
      fs.delete(new org.apache.hadoop.fs.Path(genPath(root, g)), true): Unit
    }
  }
}
