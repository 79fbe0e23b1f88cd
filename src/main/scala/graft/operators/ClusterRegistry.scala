package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GenDir

/** Persisted duplicate-cluster registry — the PROVENANCE piece of the
  * dedup lifecycle: where q159/q162 decide accept/reject per document,
  * this assigns every near-duplicate a STABLE cluster id (the minimum
  * doc id of its connected component), maintained INCREMENTALLY as
  * batches arrive, so downstream curation can trace every suppressed
  * document to the representative that kept its slot (the dedup-map
  * artifact every large training-data pipeline publishes next to the
  * corpus).
  *
  * Design — a distributed union-find with a deferred-compaction relabel
  * log, [[graft.core.GenDir]]-published:
  *
  *  - `root/_gN/assign/batch=<id>/` (doc_id, rep): MEMBER rows — docs
  *    whose cluster representative is another doc. Docs absent from the
  *    registry are singletons (rep = self) by convention, so the registry
  *    size is the number of duplicate documents, not the corpus.
  *  - `root/_gN/relabel/batch=<id>/` (old_rep, new_rep): the UNION log.
  *    When a new document BRIDGES two existing clusters, rewriting the
  *    losing cluster's member rows in place would be a corpus-sized
  *    random update; instead one (old → new) row is appended and every
  *    read resolves representatives through the (driver-bounded — one
  *    row per historical cluster merge) relabel chain. [[compact]] folds
  *    the chains back into member rows as a fresh generation.
  *
  * Exactly-once per epoch: each batch writes its own `batch=<id>` dirs
  * with overwrite, and [[register]] derives its decisions from registry
  * state EXCLUDING its own batch partitions — a replayed epoch reads the
  * same pre-state and rewrites identical rows. Across a compaction, a
  * replayed epoch re-derives against the folded state; its rows resolve
  * to the same representatives (resolution is confluent), so duplicate
  * member rows are semantically invisible (reads resolve-then-distinct).
  *
  * Scale shape: per epoch the driver holds the batch's edge list and the
  * touched partners' representatives (bounded by batch size × duplicate
  * degree, loud ceiling [[MaxEpochEdges]]) — never corpus state; the
  * corpus-sized artifact (member rows) is written distributed and read
  * as a plain parquet join side. */
object ClusterRegistry {

  /** Ceiling for one epoch's driver-side union-find input. Epochs whose
    * edge list exceeds it are NOT an error: [[register]] dispatches them
    * to the distributed pass ([[registerDistributed]] via
    * [[Dedup.connectedComponents]]) that computes the identical
    * assign/relabel rows without driver state — a hot template cluster
    * (one batch doc near-dup to a million indexed docs) produces such an
    * epoch routinely at ingest scale. `@volatile var` as a test knob
    * (the `Dedup.maxBroadcastIdBytes = 0` pattern — volatile because
    * streaming foreachBatch threads read it) to force the distributed
    * path on small fixtures. */
  @volatile private[graft] var MaxEpochEdges: Int = 1 << 22

  /** Relabel batches past which [[staleness]] recommends a [[compact]]:
    * every read pays one driver collect of the relabel log plus a
    * broadcast-join hop per lookup, so the log is kept short. */
  val CompactRelabelBatches = 4

  /** Caller batch ids: plain tokens, with the maintenance namespaces
    * RESERVED. All epoch partitions (assign/relabel/elect and the quality
    * sidecar) are written under a `b` prefix (`batch=b<id>`), so a caller
    * id can never collide with [[compact]]'s `batch=c` fold or the
    * sidecar's consolidated `batch=c<gen>` dir by construction — but the
    * explicit reservation (no `^c\d*$`, no `seed`) keeps that invariant
    * LOUD instead of incidental: a future write path that drops the
    * prefix fails its specs here rather than silently overwriting the
    * consolidated sidecar and corrupting keep-best elections. */
  private def requireBatchId(op: String, batchId: String): Unit = {
    require(batchId.matches("[A-Za-z0-9._-]+"),
      s"ClusterRegistry.$op: batchId must be a plain token, got '$batchId'")
    require(!batchId.matches("c\\d*") && batchId != "seed",
      s"ClusterRegistry.$op: batchId '$batchId' is reserved for registry " +
        "maintenance (seed / compaction folds)")
  }

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def cur(spark: SparkSession, path: String): String =
    GenDir.resolveRequired(spark, path)

  private def emptyDf(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))

  /** Per-doc quality sidecar — `root/_qual/batch=<id>`, OUTSIDE the
    * generations: (doc_id, quality) is an immutable fact about a
    * document, independent of cluster structure (it is corpus-sized —
    * one slim row per registered doc — and exists so a doc that arrives
    * as a SINGLETON and is bridged into a cluster epochs later can still
    * stand for election with its real quality). Exactly-once per batch
    * by partition overwrite; the `_` prefix keeps
    * `spark.read.parquet(root)` blind to it, like the generation dirs.
    * [[compact]] FOLDS committed batches into one consolidated dir —
    * values are never changed (per-doc max is order-free), but batch
    * dirs are rewritten in place, which is safe only under the
    * registry's standing single-maintainer discipline: register/
    * registerEpoch/compact are already mutually exclusive (compact folds
    * the relabel log register reads and writes), and the sidecar is read
    * ONLY by those maintenance ops — the serve paths (assignFor/
    * assignWithReps/electedReps) read the generation-protected member
    * and elect logs, never the sidecar. */
  private def qualRoot(path: String): String = s"$path/_qual"

  /** Marker stamping a sidecar batch dir as ABSORBED by a [[compact]]
    * fold: the dir stays as an empty tombstone (the
    * [[PhashIndex.rebuild]] device) so a late upstream retry of the
    * absorbed batch is a no-op instead of re-fragmenting the sidecar —
    * its rows already live in the consolidated `batch=c<gen>` dir. */
  private val QualFoldedMarker = "_FOLDED"

  private def writeQual(df: DataFrame, path: String, batch: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(s"${qualRoot(path)}/batch=$batch")
    val fs = fsOf(spark = df.sparkSession, path = path)
    if (fs.exists(new org.apache.hadoop.fs.Path(dir, QualFoldedMarker))) return
    df.select(col("doc_id").cast("long").as("doc_id"),
        col("quality").cast("double").as("quality"))
      .write.mode("overwrite").parquet(dir.toString)
  }

  /** Sidecar batch dirs currently HOLDING rows (tombstones excluded). */
  private def qualDataDirs(spark: SparkSession, path: String): Seq[String] = {
    val qr = new org.apache.hadoop.fs.Path(qualRoot(path))
    val fs = fsOf(spark, path)
    if (!fs.exists(qr)) Seq.empty
    else fs.listStatus(qr).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch=") &&
        !fs.exists(new org.apache.hadoop.fs.Path(s.getPath, QualFoldedMarker)))
      .map(_.getPath.toString)
  }

  /** Sidecar qualities for `ids` (bounded) — max over replay-duplicated
    * rows (identical values; max for determinism). Empty map when the
    * registry predates the quality era. */
  private def qualFor(spark: SparkSession, path: String,
      ids: Set[Long]): Map[Long, Double] = {
    // read the batch dirs EXPLICITLY, never the `_qual` root: the root's
    // underscore-prefixed name makes Spark's DataSource log an "All paths
    // were ignored" WARN on every read (the read still works — partition
    // discovery proceeds — but the WARN is noise the driver's bounded
    // tail capture pays for; VERDICT r15 item 6)
    val dirs = qualDataDirs(spark, path)
    if (ids.isEmpty || dirs.isEmpty)
      Map.empty
    else {
      import spark.implicits._
      spark.read.parquet(dirs: _*)
        .join(broadcast(ids.toSeq.toDF("doc_id")), Seq("doc_id"))
        .groupBy(col("doc_id")).agg(max(col("quality")).as("quality"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
  }

  /** Raw elect-log rows of a generation (`rep` as written — NOT yet
    * chain-resolved), with the batch partition; empty when the registry
    * predates the quality era. */
  private def rawElect(spark: SparkSession, curGen: String,
      excludeBatch: Option[String]): DataFrame = {
    val p = s"$curGen/elect"
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(p)))
      emptyDf(spark,
        "rep BIGINT, best_doc BIGINT, best_quality DOUBLE, batch STRING")
    else {
      val raw = spark.read.parquet(p)
        .select(col("rep"), col("best_doc"), col("best_quality"),
          col("batch").cast("string").as("batch"))
      excludeBatch.fold(raw)(b => raw.filter(col("batch") =!= b))
    }
  }

  /** Elect rows with their written rep resolved through the relabel
    * chain — (rep_r, best_doc, best_quality). */
  private def electResolved(spark: SparkSession, curGen: String,
      rel: Map[Long, Long], excludeBatch: Option[String]): DataFrame = {
    import spark.implicits._
    val e = rawElect(spark, curGen, excludeBatch)
      .select(col("rep"), col("best_doc"), col("best_quality"))
    if (rel.isEmpty) e.withColumnRenamed("rep", "rep_r")
    else {
      val relDf = rel.toSeq.toDF("rep", "relto")
      e.join(broadcast(relDf), Seq("rep"), "left")
        .select(coalesce(col("relto"), col("rep")).as("rep_r"),
          col("best_doc"), col("best_quality"))
    }
  }

  /** The elected representative per cluster — (rep, rep_doc,
    * rep_quality): max quality, ties to the smaller doc id, over the
    * relabel-resolved elect log. Per-cluster best under (quality desc,
    * id asc) is a semilattice max, so the fold over per-epoch rows of
    * MERGED clusters is exactly the best over the union of their
    * members — no log replay order matters. Empty for a registry never
    * given quality. */
  def electedReps(spark: SparkSession, path: String): DataFrame = {
    val g = cur(spark, path)
    electedRepsAt(spark, g, relabelMap(spark, g, excludeBatch = None))
  }

  private def electedRepsAt(spark: SparkSession, g: String,
      rel: Map[Long, Long]): DataFrame =
    electResolved(spark, g, rel, excludeBatch = None)
      .groupBy(col("rep_r").as("rep"))
      .agg(max(struct(col("best_quality"), (-col("best_doc")).as("negid"))).as("w"))
      .select(col("rep"), (-col("w.negid")).as("rep_doc"),
        col("w.best_quality").as("rep_quality"))

  /** [[assignFor]] plus the quality-elected representative: (doc_id,
    * cluster_id, rep_doc) — `cluster_id` is the stable minimum-id label
    * the union-find maintains, `rep_doc` the member that KEPT THE SLOT
    * under keep-best election (falls back to the cluster id for
    * registries or clusters without quality data). This is the dedup-map
    * artifact row: every suppressed document traceable to the doc that
    * survived. */
  def assignWithReps(docs: DataFrame, path: String,
      docsDistinct: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    // resolve the generation and collect the relabel log ONCE for both
    // halves — also guarantees the assignment and the election read the
    // same generation even if a compaction publishes mid-call
    val g = cur(spark, path)
    val rel = relabelMap(spark, g, excludeBatch = None)
    assignForAt(docs, g, rel, docsDistinct)
      .join(electedRepsAt(spark, g, rel), Seq("rep"), "left")
      .select(col("doc_id"), col("rep").as("cluster_id"),
        coalesce(col("rep_doc"), col("rep")).as("rep_doc"))
  }

  /** Seed generation 0 from a batch pair set (the base corpus's own
    * connected components, computed once at build time — this is what
    * lets the stream see base↔base duplicate structure it could never
    * observe itself).
    *
    * `quality` (doc_id, quality), when given, makes the registry
    * QUALITY-AWARE: it should cover the WHOLE base corpus — not just the
    * paired docs — so a base singleton bridged into a cluster epochs
    * later can still stand for election. Each seed cluster's elected
    * representative (max quality, ties to the smaller id) is logged. */
  def seed(spark: SparkSession, pairs: DataFrame, path: String,
      quality: Option[DataFrame] = None): Unit = {
    val fs = fsOf(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(p)) fs.delete(p, true)
    val g0 = GenDir.genPath(path, 0)
    val cc = quality.fold(Dedup.connectedComponents(pairs))(_ =>
      graft.core.GraftSession.pin(Dedup.connectedComponents(pairs)))
    try {
      cc.filter(col("rep") =!= col("doc_id"))
        .select(col("doc_id"), col("rep"))
        .write.mode("overwrite").parquet(s"$g0/assign/batch=seed")
      emptyDf(spark, "old_rep BIGINT, new_rep BIGINT")
        .write.mode("overwrite").parquet(s"$g0/relabel/batch=seed")
      quality.foreach { q =>
        writeQual(q, path, "seed")
        cc.join(q.select(col("doc_id"),
            col("quality").cast("double").as("quality")), Seq("doc_id"))
          .groupBy(col("rep"))
          .agg(max(struct(col("quality"), (-col("doc_id")).as("negid"))).as("w"))
          .select(col("rep"), (-col("w.negid")).as("best_doc"),
            col("w.quality").as("best_quality"))
          .write.mode("overwrite").parquet(s"$g0/elect/batch=seed")
      }
    } finally if (quality.isDefined) graft.core.GraftSession.release(cc)
    GenDir.commit(spark, path, 0)
  }

  /** Member rows of the live generation, with their batch partition
    * (raw — representatives NOT yet chain-resolved). */
  private def rawAssign(spark: SparkSession, curGen: String): DataFrame =
    spark.read.parquet(s"$curGen/assign")
      .select(col("doc_id"), col("rep"), col("batch").cast("string").as("batch"))

  /** The relabel log collapsed to final targets (chains resolved on the
    * driver — bounded by one row per historical cluster merge). Excludes
    * `excludeBatch` so a replayed epoch derives from its pre-state. */
  private def relabelMap(spark: SparkSession, curGen: String,
      excludeBatch: Option[String]): Map[Long, Long] = {
    val raw = spark.read.parquet(s"$curGen/relabel")
      .select(col("old_rep"), col("new_rep"), col("batch").cast("string").as("batch"))
    val rows = excludeBatch.fold(raw)(b => raw.filter(col("batch") =!= b))
      .select(col("old_rep"), col("new_rep")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // defensive min on duplicate keys (replay overlap windows), then
    // resolve chains to their final target — new_rep < old_rep always,
    // so chains are finite and cycle-free
    val m = scala.collection.mutable.HashMap.empty[Long, Long]
    rows.foreach { case (o, n) =>
      m.get(o) match {
        case Some(e) => m(o) = math.min(e, n)
        case None => m(o) = n
      }
    }
    def resolve(x: Long): Long = {
      var r = x
      while (m.getOrElse(r, r) != r) r = m(r)
      r
    }
    m.keys.toSeq.map(o => o -> resolve(o)).toMap
  }

  /** Resolved representatives for `docs` (a frame with `doc_id`): member
    * rows joined, relabel chains applied, absent docs are singletons.
    * One distributed join against the member rows (broadcast-gated by
    * Spark's own stats) plus one broadcast hop for the relabel map.
    *
    * `docsDistinct = true` skips the output dedup — a corpus-wide shuffle
    * that is a pure no-op when (a) `docs` carries no duplicate ids AND
    * (b) no epoch has been REPLAYED since the last [[compact]] (a replay
    * across a compaction leaves the doc a member row in both the folded
    * `batch=c` and its re-written `batch=b<id>` partition — confluent,
    * identical reps, but two join matches). The default keeps the dedup:
    * correctness over one shuffle unless the caller can prove both. */
  def assignFor(docs: DataFrame, path: String,
      docsDistinct: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    val g = cur(spark, path)
    assignForAt(docs, g, relabelMap(spark, g, excludeBatch = None), docsDistinct)
  }

  private def assignForAt(docs: DataFrame, g: String, rel: Map[Long, Long],
      docsDistinct: Boolean): DataFrame = {
    val spark = docs.sparkSession
    val base = docs.select(col("doc_id"))
      .join(rawAssign(spark, g).select(col("doc_id"), col("rep")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep0"))
    val resolved =
      if (rel.isEmpty) base.select(col("doc_id"), col("rep0").as("rep"))
      else {
        import spark.implicits._
        val relDf = rel.toSeq.toDF("rep0", "relto")
        base.join(broadcast(relDf), Seq("rep0"), "left")
          .select(col("doc_id"), coalesce(col("relto"), col("rep0")).as("rep"))
      }
    if (docsDistinct) resolved else resolved.distinct()
  }

  /** Fold one epoch's near-dup edges into the registry, exactly-once per
    * `batchId`. `edges` are (batch doc, other) pairs where `other` is a
    * batch doc (within-batch pass) or any already-seen doc (index serve);
    * partner↔partner edges never occur (the serve only pairs the batch).
    * The union-find runs driver-side over the batch docs plus the touched
    * partners' CURRENT representatives — [[MaxEpochEdges]]-bounded.
    *
    * `batchQuality` (nonempty = quality-aware epoch) maps every batch doc
    * to its quality: the batch's (doc, quality) rows land in the sidecar
    * and each epoch-touched component logs its elected representative —
    * max quality, ties to the smaller id, over the batch docs in the
    * component, the merged clusters' prior electeds, and bridged
    * singletons' sidecar qualities. */
  def register(spark: SparkSession, path: String,
      batchDocs: Seq[Long], edges: Seq[(Long, Long)], batchId: String,
      batchQuality: Map[Long, Double] = Map.empty): Unit = {
    requireBatchId("register", batchId)
    if (edges.size > MaxEpochEdges) {
      // past the driver ceiling this is a dispatch, not a crash (the
      // data-size-dependent-require anti-pattern): same decision, computed
      // distributed
      import spark.implicits._
      // getOrElse, not apply: the driver path below tolerates a doc
      // missing from batchQuality (-inf candidate) — the dispatch must
      // not turn that same input into a key-not-found crash
      val docsDf =
        if (batchQuality.isEmpty) batchDocs.toDF("doc_id")
        else batchDocs
          .map(d => (d, batchQuality.getOrElse(d, Double.NegativeInfinity)))
          .toDF("doc_id", "quality")
      registerDistributed(spark, path, docsDf,
        edges.toDF("doc_a", "doc_b"), batchId)
      return
    }
    val g = cur(spark, path)
    val batchSet = batchDocs.toSet
    // exclude by the WRITTEN partition value (`b<id>`, line below) — the
    // bare id never matches, which would let a replayed bridging epoch
    // read its own prior relabel rows, derive an empty relabel set, and
    // overwrite (= delete) union-log rows still resolving older members
    val rel = relabelMap(spark, g, excludeBatch = Some(s"b$batchId"))
    def chase(x: Long): Long = rel.getOrElse(x, x)
    // current representative of every non-batch partner: raw member row
    // (excluding this batch's own prior write — replay determinism), then
    // the relabel chain; absent partner = itself (singleton or a rep)
    val partners = edges.iterator.flatMap(e => Iterator(e._1, e._2))
      .filterNot(batchSet).toSet
    val partnerRaw: Map[Long, Long] =
      if (partners.isEmpty) Map.empty
      else {
        import spark.implicits._
        val pdf = partners.toSeq.toDF("doc_id")
        rawAssign(spark, g).filter(col("batch") =!= s"b$batchId")
          .join(broadcast(pdf), Seq("doc_id"))
          .select(col("doc_id"), col("rep")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
      }
    def repOf(p: Long): Long = chase(partnerRaw.getOrElse(p, p))
    // driver union-find by min over batch docs + touched representatives
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }: Unit
    }
    def node(x: Long): Long = if (batchSet.contains(x)) x else repOf(x)
    edges.foreach { case (a, b) => union(node(a), node(b)) }
    val assignRows = batchDocs.sorted.flatMap { d =>
      val f = find(d)
      if (f != d) Some((d, f)) else None
    }
    val touchedReps = partners.map(repOf)
    val relabelRows = touchedReps.toSeq.sorted.flatMap { r =>
      val f = find(r)
      if (f != r) Some((r, f)) else None
    }
    import spark.implicits._
    assignRows.toDF("doc_id", "rep")
      .write.mode("overwrite").parquet(s"$g/assign/batch=b$batchId")
    relabelRows.toDF("old_rep", "new_rep")
      .write.mode("overwrite").parquet(s"$g/relabel/batch=b$batchId")
    if (batchQuality.nonEmpty) {
      writeQual(batchQuality.toSeq.sortBy(_._1).toDF("doc_id", "quality"),
        path, s"b$batchId")
      // candidates per epoch component: batch docs (caller quality) ∪
      // merged clusters' prior electeds (elect log, OWN BATCH EXCLUDED —
      // replay determinism) ∪ bridged singleton/legacy reps (sidecar).
      // Per-component best is a semilattice max, so logging one row per
      // touched component keeps electedReps exact across any schedule.
      val priorElect: Map[Long, (Long, Double)] =
        if (touchedReps.isEmpty) Map.empty
        else electResolved(spark, g, rel, excludeBatch = Some(s"b$batchId"))
          .join(broadcast(touchedReps.toSeq.toDF("rep_r")), Seq("rep_r"))
          .collect()
          .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
          .groupBy(_._1).map { case (k, vs) =>
            k -> vs.map(_._2).minBy { case (d, q) => (-q, d) }
          }
      val sidecarQ = qualFor(spark, path,
        touchedReps.diff(priorElect.keySet))
      val nodes = edges.iterator
        .flatMap(e => Iterator(node(e._1), node(e._2))).toSet
      val electRows = nodes.groupBy(find).toSeq.sortBy(_._1).map {
        case (root, members) =>
          val cands = members.toSeq.flatMap { n =>
            if (batchSet.contains(n))
              Some((n, batchQuality.getOrElse(n, Double.NegativeInfinity)))
            else priorElect.get(n).orElse(
              Some((n, sidecarQ.getOrElse(n, Double.NegativeInfinity))))
          }
          val (bd, bq) = cands.minBy { case (d, q) => (-q, d) }
          (root, bd, bq)
      }
      electRows.toDF("rep", "best_doc", "best_quality")
        .write.mode("overwrite").parquet(s"$g/elect/batch=b$batchId")
    }
  }

  /** DataFrame-shaped epoch entry: counts the edges once and dispatches.
    * At or below [[MaxEpochEdges]] the edge list is collected and folded
    * with the driver union-find ([[register]] — cheaper: no Spark jobs
    * per propagation round); above it the identical decision is computed
    * distributed without ever materializing the edges on the driver.
    * `batchDocs` is one `doc_id` column, `edges` is (`doc_a`, `doc_b`). */
  def registerEpoch(spark: SparkSession, path: String,
      batchDocs: DataFrame, edges: DataFrame, batchId: String): Unit = {
    requireBatchId("registerEpoch", batchId)
    // pin the edge frame across the dispatch: its lineage is typically a
    // pair of LSH serve joins (the q163 epoch), and both the count probe
    // and the chosen path re-read it — without the pin every epoch would
    // pay the serve cost twice
    val e = graft.core.GraftSession.pin(
      edges.select(col("doc_a").cast("long").as("doc_a"),
        col("doc_b").cast("long").as("doc_b")))
    try {
      if (e.limit(MaxEpochEdges + 1).count() > MaxEpochEdges)
        registerDistributed(spark, path, batchDocs, e, batchId)
      else {
        val es = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        if (batchDocs.columns.contains("quality")) {
          val dq = batchDocs.select(col("doc_id").cast("long"),
              col("quality").cast("double"))
            .collect().map(r => (r.getLong(0), r.getDouble(1)))
          register(spark, path, dq.map(_._1).toSeq, es, batchId, dq.toMap)
        } else {
          val docs = batchDocs.select(col("doc_id").cast("long"))
            .collect().map(_.getLong(0)).toSeq
          register(spark, path, docs, es, batchId)
        }
      }
    } finally graft.core.GraftSession.release(e)
  }

  /** The distributed twin of [[register]]'s driver fold — same inputs,
    * same written rows, no driver state beyond the (historically-bounded)
    * relabel map:
    *
    *  1. each non-batch endpoint is node-mapped to its CURRENT
    *     representative (member row excluding this batch's prior write,
    *     then the relabel chain — exactly [[register]]'s `node()`),
    *  2. [[Dedup.connectedComponents]] labels the mapped edge graph with
    *     component minima (identical to the driver union-find-by-min, and
    *     already restricted to touched components — only vertices on this
    *     epoch's edges enter the propagation),
    *  3. assign rows = batch docs whose label differs from themselves;
    *     relabel rows = touched representatives whose label differs —
    *     written with the same overwrite-own-partition exactly-once
    *     discipline.
    *
    * Scale shape: two shuffles to node-map (joins against the member
    * rows, broadcast-gated by Spark stats), the CC propagation (driver
    * path below `maxLocalEdges`, min-label rounds above), one shuffle per
    * output join. The driver holds only the relabel map. */
  private def registerDistributed(spark: SparkSession, path: String,
      batchDocs: DataFrame, edges: DataFrame, batchId: String): Unit = {
    graft.core.GraftSession.pinScope {
    val g = cur(spark, path)
    val rel = relabelMap(spark, g, excludeBatch = Some(s"b$batchId"))
    import spark.implicits._
    val bset = graft.core.GraftSession.pin(
      batchDocs.select(col("doc_id").cast("long").as("doc_id")).distinct())
    val verts = edges.select(col("doc_a").as("doc_id"))
      .union(edges.select(col("doc_b").as("doc_id"))).distinct()
    val relDf = rel.toSeq.toDF("rep0", "relto")
    // current rep of every non-batch endpoint ([[register]]'s repOf):
    // member row excluding own prior write, then the relabel chain;
    // absent partner = itself
    val pRep = graft.core.GraftSession.pin(
      verts.join(bset, Seq("doc_id"), "left_anti")
        .join(rawAssign(spark, g).filter(col("batch") =!= s"b$batchId")
          .select(col("doc_id"), col("rep")), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep0"))
        .join(broadcast(relDf), Seq("rep0"), "left")
        .select(col("doc_id"),
          coalesce(col("relto"), col("rep0")).as("prep")))
    val mapped = edges
      .join(pRep.select(col("doc_id").as("doc_a"), col("prep").as("na")),
        Seq("doc_a"), "left")
      .join(pRep.select(col("doc_id").as("doc_b"), col("prep").as("nb")),
        Seq("doc_b"), "left")
      .select(coalesce(col("na"), col("doc_a")).as("doc_a"),
        coalesce(col("nb"), col("doc_b")).as("doc_b"))
    val cc = graft.core.GraftSession.pin(Dedup.connectedComponents(mapped))
    val assignRows = bset.join(cc, Seq("doc_id"))
      .filter(col("rep") =!= col("doc_id"))
      .select(col("doc_id"), col("rep"))
    val relabelRows = pRep.select(col("prep").as("doc_id")).distinct()
      .join(cc, Seq("doc_id"))
      .filter(col("rep") =!= col("doc_id"))
      .select(col("doc_id").as("old_rep"), col("rep").as("new_rep"))
    assignRows.write.mode("overwrite").parquet(s"$g/assign/batch=b$batchId")
    relabelRows.write.mode("overwrite").parquet(s"$g/relabel/batch=b$batchId")
    if (batchDocs.columns.contains("quality")) {
      // quality-aware epoch — the distributed twin of [[register]]'s
      // election: candidates per component label are batch docs (caller
      // quality), merged clusters' prior electeds (elect log resolved,
      // own batch excluded), and bridged singleton/legacy reps (sidecar,
      // -inf fallback); winner = lexicographic max of (quality, -doc)
      val bq = batchDocs.select(col("doc_id").cast("long").as("doc_id"),
        col("quality").cast("double").as("quality"))
      writeQual(bq, path, s"b$batchId")
      val candBatch = bq.join(cc, Seq("doc_id"))
        .select(col("rep").as("lbl"), col("doc_id").as("cand"), col("quality").as("q"))
      val prior = electResolved(spark, g, rel, excludeBatch = Some(s"b$batchId"))
      val preps = pRep.select(col("prep")).distinct()
      val candPrior = prior
        .join(preps, col("rep_r") === col("prep"))
        .join(cc.select(col("doc_id").as("rep_r"), col("rep").as("lbl")), Seq("rep_r"))
        .select(col("lbl"), col("best_doc").as("cand"), col("best_quality").as("q"))
      // batch dirs explicitly, never the `_qual` root (same WARN-noise
      // reason as qualFor)
      val qualDirs = qualDataDirs(spark, path)
      // semi-join the (batch-bounded) singleton set into the sidecar
      // BEFORE aggregating — the sidecar is corpus-sized (one row per
      // registered doc) and Catalyst cannot push a join below a groupBy,
      // so aggregating first would shuffle the whole sidecar per epoch
      val singletons = preps
        .join(prior.select(col("rep_r").as("prep")).distinct(),
          Seq("prep"), "left_anti")
      val qualDf =
        if (qualDirs.nonEmpty)
          spark.read.parquet(qualDirs: _*)
            .join(singletons.select(col("prep").as("doc_id")), Seq("doc_id"),
              "left_semi")
            .groupBy(col("doc_id")).agg(max(col("quality")).as("sq"))
        else emptyDf(spark, "doc_id BIGINT, sq DOUBLE")
      val candSingleton = singletons
        .join(cc.select(col("doc_id").as("prep"), col("rep").as("lbl")), Seq("prep"))
        .join(qualDf.select(col("doc_id").as("prep"), col("sq")), Seq("prep"), "left")
        .select(col("lbl"), col("prep").as("cand"),
          coalesce(col("sq"), lit(Double.NegativeInfinity)).as("q"))
      candBatch.unionByName(candPrior).unionByName(candSingleton)
        .groupBy(col("lbl"))
        .agg(max(struct(col("q"), (-col("cand")).as("negid"))).as("w"))
        .select(col("lbl").as("rep"), (-col("w.negid")).as("best_doc"),
          col("w.q").as("best_quality"))
        .write.mode("overwrite").parquet(s"$g/elect/batch=b$batchId")
    }
    // all outputs are on disk — nothing escapes the scope, so every pin
    // (bset, pRep, cc) is dead here; the empty frame keeps none of them
    spark.emptyDataFrame
    }: Unit
  }

  /** Registry health: member rows, relabel entries/batches, whether the
    * relabel log is long enough to fold ([[CompactRelabelBatches]]) —
    * plus the ELECTION surface a dedup-map consumer needs to tell
    * keep-best provenance from the min-id fallback
    * ([[assignWithReps]] silently uses `rep_doc = cluster_id` for
    * quality-less registries/clusters): `has_quality` (the registry
    * carries an elect log or sidecar rows), `elected_clusters` (clusters
    * with a keep-best winner), and `qual_batches` (sidecar DATA dirs —
    * the fragmentation [[compact]]'s sidecar fold resets). */
  def staleness(spark: SparkSession, path: String): DataFrame = {
    val g = cur(spark, path)
    val rel = relabelMap(spark, g, excludeBatch = None)
    // one Spark job for all three counts (the r11 rebuildIvfIndex fold):
    // distinct members, relabel rows and distinct elected clusters union
    // through a tag column
    val counts = rawAssign(spark, g).select(col("doc_id")).distinct()
      .select(lit("m").as("k"))
      .unionByName(spark.read.parquet(s"$g/relabel").select(lit("r").as("k")))
      .unionByName(electResolved(spark, g, rel, excludeBatch = None)
        .select(col("rep_r")).distinct().select(lit("e").as("k")))
      .groupBy(col("k")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val members = counts.getOrElse("m", 0L)
    val relRows = counts.getOrElse("r", 0L)
    val elected = counts.getOrElse("e", 0L)
    // batch DIRS, not row-bearing batches: every read pays the dir
    // listing whether a batch carried relabels or not (an epoch with no
    // bridges still writes its empty exactly-once partition), so the
    // fragmentation signal is the filesystem count — the same
    // files-not-batches reasoning as UrlIndex.fileCount
    val relBatches = fsOf(spark, path)
      .listStatus(new org.apache.hadoop.fs.Path(s"$g/relabel"))
      .count(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .toLong
    val qualBatches = qualDataDirs(spark, path).size.toLong
    val hasQuality = qualBatches > 0L ||
      fsOf(spark, path).exists(new org.apache.hadoop.fs.Path(s"$g/elect"))
    spark.createDataFrame(Seq((members, relRows, relBatches,
        relBatches > CompactRelabelBatches, hasQuality, elected, qualBatches)))
      .toDF("member_rows", "relabel_rows", "relabel_batches",
        "compact_recommended", "has_quality", "elected_clusters",
        "qual_batches")
  }

  /** Fold the relabel log into the member rows as a fresh generation
    * ([[graft.core.GenDir]] publish — reader-atomic, crash debris swept):
    * every member row gets its chain-resolved representative, every
    * RELABELED representative becomes a member row of its final cluster
    * (it is a document too — without this row it would read as a
    * singleton once the log is gone), and the new relabel log is empty. */
  def compact(spark: SparkSession, path: String): Unit = {
    val g = cur(spark, path)
    val rel = relabelMap(spark, g, excludeBatch = None)
    val gen = GenDir.next(spark, path)
    val stage = GenDir.genPath(path, gen)
    import spark.implicits._
    val relDf = rel.toSeq.toDF("rep0", "relto")
    val folded = rawAssign(spark, g)
      .select(col("doc_id"), col("rep").as("rep0"))
      .join(broadcast(relDf), Seq("rep0"), "left")
      .select(col("doc_id"), coalesce(col("relto"), col("rep0")).as("rep"))
      .unionByName(rel.toSeq.toDF("doc_id", "rep"))
      .filter(col("rep") =!= col("doc_id"))
      .distinct()
    folded.write.mode("overwrite").parquet(s"$stage/assign/batch=c")
    emptyDf(spark, "old_rep BIGINT, new_rep BIGINT")
      .write.mode("overwrite").parquet(s"$stage/relabel/batch=c")
    // fold the elect log too: one row per final cluster, its elected
    // representative chain-resolved and max-reduced (the sidecar is NOT
    // touched — per-doc quality is immutable and lives outside the
    // generations). Skipped for registries that predate the quality era.
    if (fsOf(spark, path)
        .exists(new org.apache.hadoop.fs.Path(s"$g/elect")))
      electResolved(spark, g, rel, excludeBatch = None)
        .groupBy(col("rep_r").as("rep"))
        .agg(max(struct(col("best_quality"), (-col("best_doc")).as("negid"))).as("w"))
        .select(col("rep"), (-col("w.negid")).as("best_doc"),
          col("w.best_quality").as("best_quality"))
        .write.mode("overwrite").parquet(s"$stage/elect/batch=c")
    // fold the quality sidecar too (one `batch=` dir per epoch FOREVER
    // was the r13 residual — at daily-epoch cadence that is hundreds of
    // tiny-file dirs on every election read): per-doc max is order-free,
    // so one consolidated `batch=c<gen>` dir is exact; absorbed dirs stay
    // as empty `_FOLDED` tombstones (the [[PhashIndex.rebuild]] device)
    // so a late upstream retry of an absorbed batch is a no-op. The
    // sidecar lives OUTSIDE generations, so the fold is idempotent rather
    // than publish-atomic: a re-run re-reads whatever data dirs remain
    // (max over duplicates is the same value) and re-tombstones.
    val dataDirs = qualDataDirs(spark, path)
    if (dataDirs.nonEmpty) {
      val fs = fsOf(spark, path)
      val cdir = s"${qualRoot(path)}/batch=c$gen"
      spark.read.parquet(dataDirs: _*)
        .groupBy(col("doc_id")).agg(max(col("quality")).as("quality"))
        .write.mode("overwrite").parquet(cdir)
      // exclude by NAME, not string equality: listing paths are
      // scheme-qualified (file:/...) while cdir is the caller's raw form
      // — a string compare would never match and a future gen-numbering
      // change could tombstone the dir just written
      dataDirs.filterNot(d =>
          new org.apache.hadoop.fs.Path(d).getName == s"batch=c$gen")
        .foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        fs.delete(p, true)
        fs.mkdirs(p)
        fs.create(new org.apache.hadoop.fs.Path(p, QualFoldedMarker),
          false).close()
      }
    }
    GenDir.commit(spark, path, gen)
  }
}
