package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GenDir

/** Persisted perceptual-hash near-dup index — the multimodal family's
  * full lifecycle (build → serve → append → staleness → rebuild), the
  * [[Dedup.minhashIndexWrite]] analog for 64-bit signatures: where the
  * minhash index buckets shingle signatures, this one stores the
  * pigeonhole BANDS of each media row's perceptual hash
  * ([[Media.phashAll]] — `maxDist + 1` chunks; any pair within Hamming
  * distance maxDist agrees exactly on ≥ 1 chunk, so a band-equality join
  * has full recall), which makes daily image-dedup ingest an
  * index-lookup instead of an all-pairs pass.
  *
  * Layout under a [[graft.core.GenDir]] root (reader-atomic generations,
  * no new swap machinery):
  * {{{
  *   root/_gN/bands/              (ci, cv, doc_id, simhash)  — built mass
  *   root/_gN/meta/               (max_dist, built_rows)
  *   root/_gN/appends/batch=<id>/ banded delta rows + _DONE sentinel
  * }}}
  * Append batches are SELF-CONTAINED: the banded rows are the data AND
  * the staleness evidence (each doc contributes exactly `max_dist + 1`
  * band rows, so appended docs = rows / bands — no separate counter
  * parquet), and the `_DONE` sentinel is the single commit point (the
  * object-store discipline: dir existence is never commit evidence).
  * Readers resolve ONE generation per operation and union `bands` with
  * the committed appends.
  *
  * Scale shape: the stored artifact is `(maxDist+1)` slim rows per media
  * row (≈ 100 bytes/row at 100 TB of images — the corpus collapses to
  * signatures before any join); serve shuffles on (ci, cv) with the
  * batch side broadcast-eligible; rebuild is one distinct + re-band pass
  * over the index's own rows, never the media bytes. */
object PhashIndex {

  private val DoneMarker = "_DONE"

  /** Appended fraction above which [[staleness]] recommends a rebuild —
    * banding is untrained (unlike the IVF codebook), so the rebuild is
    * pure DEFRAGMENTATION: appended batches pile up one dir listing +
    * union leg per batch on every serve, and the fold returns the index
    * to one bands dir. Same conservative threshold as the minhash twin. */
  val RebuildFraction = 0.5

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def cur(spark: SparkSession, path: String): String =
    GenDir.resolveRequired(spark, path)

  private def banded(df: DataFrame, idCol: String, mediaCol: String,
      maxDist: Int): DataFrame =
    Dedup.bandedSignatures(Media.phashAll(df, idCol, mediaCol), maxDist)
      .select(col("ci"), col("cv"), col("doc_id"), col("simhash"))

  /** Build the index over a media corpus, publishing generation 0. */
  def build(df: DataFrame, idCol: String, mediaCol: String, path: String,
      maxDist: Int = 3): Unit = {
    require(maxDist >= 0 && maxDist <= 16, "maxDist must be in [0, 16]")
    val spark = df.sparkSession
    import spark.implicits._
    val fs = fsOf(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(p)) fs.delete(p, true)
    val g0 = GenDir.genPath(path, 0)
    val rows = graft.core.GraftSession.pin(banded(df, idCol, mediaCol, maxDist))
    rows.write.mode("overwrite").parquet(s"$g0/bands")
    // built_rows = distinct docs (each doc is maxDist+1 band rows)
    val built = rows.select(col("doc_id")).distinct().count()
    graft.core.GraftSession.release(rows)
    Seq((maxDist, built)).toDF("max_dist", "built_rows")
      .write.mode("overwrite").parquet(s"$g0/meta")
    GenDir.commit(spark, path, 0)
  }

  /** Committed append batch dirs of a resolved generation. */
  private def committedAppends(spark: SparkSession, curGen: String): Seq[String] = {
    val appends = new org.apache.hadoop.fs.Path(s"$curGen/appends")
    val fs = appends.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(appends)) Seq.empty
    else fs.listStatus(appends).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch=") &&
        fs.exists(new org.apache.hadoop.fs.Path(s.getPath, DoneMarker)))
      .map(_.getPath.toString)
  }

  /** The live banded rows: built mass plus every committed append. */
  private def indexRows(spark: SparkSession, curGen: String): DataFrame = {
    val appends = committedAppends(spark, curGen)
    val base = spark.read.parquet(s"$curGen/bands")
    if (appends.isEmpty) base
    else base.unionByName(spark.read.parquet(appends: _*)
      .select(col("ci"), col("cv"), col("doc_id"), col("simhash")))
  }

  private def maxDistOf(spark: SparkSession, curGen: String): Int =
    spark.read.parquet(s"$curGen/meta").select(col("max_dist")).head().getInt(0)

  /** Near-dup pairs of a delta batch AGAINST the index — (doc_a = index
    * doc, doc_b = batch doc, hamming ≤ maxDist), the
    * [[Dedup.minhashLshAgainstIndex]] orientation. Same-id pairs are
    * dropped here (the replay discipline: a replayed epoch's own
    * committed signatures must not pair with themselves); pairs whose
    * index doc is a member of the batch are left to the CALLER's
    * within-batch pass, exactly like the minhash serve. One band-keyed
    * join per serve — the batch side is tiny and broadcast-eligible. */
  def pairsAgainstIndex(batch: DataFrame, idCol: String, mediaCol: String,
      path: String): DataFrame = {
    val spark = batch.sparkSession
    val g = cur(spark, path)
    val md = maxDistOf(spark, g)
    val b = banded(batch, idCol, mediaCol, md)
      .select(col("ci"), col("cv"),
        col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    indexRows(spark, g)
      .select(col("ci"), col("cv"),
        col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
      .join(b, Seq("ci", "cv"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      // hamming BEFORE the distinct: identical result set (the predicate is
      // row-wise, so filter∘distinct == distinct∘filter), but the one
      // corpus-output-sized exchange of the serve — the multi-band pair
      // distinct — now carries only pairs that pass the threshold instead
      // of every band collision (guide §2.3 shuffle fewer bytes)
      .filter(col("hamming") <= md)
      .distinct()
  }

  /** Merge a delta batch into the index, exactly-once per `batchId`: the
    * banded rows land in a self-contained `appends/batch=<id>` dir whose
    * `_DONE` sentinel is the commit point — a retry of a committed batch
    * is a no-op, a crashed append leaves a sentinel-less dir the retry
    * deletes and redoes. */
  def append(batch: DataFrame, idCol: String, mediaCol: String, path: String,
      batchId: String): Unit = {
    require(batchId.matches("[A-Za-z0-9._-]+"),
      s"PhashIndex.append: batchId must be a plain token, got '$batchId'")
    val spark = batch.sparkSession
    val g = cur(spark, path)
    val dir = new org.apache.hadoop.fs.Path(s"$g/appends/batch=$batchId")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(dir, DoneMarker))) return
    if (fs.exists(dir)) fs.delete(dir, true)
    banded(batch, idCol, mediaCol, maxDistOf(spark, g))
      .write.mode("overwrite").parquet(dir.toString)
    fs.create(new org.apache.hadoop.fs.Path(dir, DoneMarker), false).close()
  }

  /** Staleness report: built docs, appended docs (band rows / bands —
    * committed batches only), fraction, and the rebuild recommendation. */
  def staleness(spark: SparkSession, path: String): DataFrame = {
    val g = cur(spark, path)
    val built = spark.read.parquet(s"$g/meta")
      .select(col("built_rows")).head().getLong(0)
    val bands = maxDistOf(spark, g) + 1
    val appends = committedAppends(spark, g)
    val appended =
      if (appends.isEmpty) 0L
      else spark.read.parquet(appends: _*).count() / bands
    val frac = appended.toDouble / math.max(built + appended, 1L)
    spark.createDataFrame(Seq((built, appended, frac, frac > RebuildFraction)))
      .toDF("built_rows", "appended_rows", "appended_fraction",
        "rebuild_recommended")
  }

  /** Fold the committed appends into a fresh generation: one distinct
    * pass over the index's own signature rows (never the media bytes),
    * re-banded and published reader-atomically. Each absorbed batch
    * leaves an EMPTY committed append dir in the new generation — the
    * tombstone that keeps a late upstream retry of that batch a no-op
    * while the staleness counter reads 0. Banding is untrained, so the
    * rebuild changes no pair: serve-before == serve-after (spec-pinned). */
  def rebuild(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    val g = cur(spark, path)
    val md = maxDistOf(spark, g)
    val sigs = graft.core.GraftSession.pin(
      indexRows(spark, g).select(col("doc_id"), col("simhash")).distinct())
    val gen = GenDir.next(spark, path)
    val stage = GenDir.genPath(path, gen)
    Dedup.bandedSignatures(sigs, md)
      .select(col("ci"), col("cv"), col("doc_id"), col("simhash"))
      .write.mode("overwrite").parquet(s"$stage/bands")
    val built = sigs.count()
    graft.core.GraftSession.release(sigs)
    Seq((md, built)).toDF("max_dist", "built_rows")
      .write.mode("overwrite").parquet(s"$stage/meta")
    val fs = fsOf(spark, path)
    committedAppends(spark, g).foreach { b =>
      val name = new org.apache.hadoop.fs.Path(b).getName
      val dest = s"$stage/appends/$name"
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "ci INT, cv BIGINT, doc_id BIGINT, simhash BIGINT"))
        .write.mode("overwrite").parquet(dest)
      fs.create(new org.apache.hadoop.fs.Path(dest, DoneMarker), false).close()
    }
    GenDir.commit(spark, path, gen)
  }
}
