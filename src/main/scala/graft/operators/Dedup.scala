package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{char_ngram_hashes, fingerprint64, minhash_sig, norm_text, shingle_hashes, simhash_sig, sorted_intersect_count}

/** Large-scale deduplication operators (LLM-data-pipeline surface).
  *
  * All operators are declarative DataFrame plans — shuffles are on the
  * natural keys only (doc_id / shingle / band bucket) so every stage scales
  * horizontally; nothing is collected to the driver.
  */
object Dedup {

  /** Reliable-checkpoint cadence for the connected-components min-label
    * loop: lineage/plan depth between durable truncation points stays
    * bounded (near-dup graphs converge in 2-3 rounds, so the common case
    * never pays the write at all). */
  private[graft] val CcCheckpointEvery = 3

  /** Broadcast ceiling for the verify-path candidate-id probe (the
    * [[Similarity.MaxBroadcastProbeRows]] pattern applied to dedup).
    * Candidate-set size scales with the corpus's near-dup DENSITY, not a
    * contract-bounded batch — a 100 TB corpus with a high dup rate can
    * push the id set past any broadcast budget, and an unconditional
    * `broadcast(ids)` would then fail the job outright. Below the ceiling
    * the semi join broadcasts (ids frames derive from a pinned candidate
    * frame, so the estimate is MEASURED size, not guesswork); above it the
    * hint is dropped and Catalyst plans a shuffle semi join — values
    * identical on both paths (BroadcastGateSpec pins it). Var, not val:
    * the spec forces the shuffle path by setting it to 0. */
  private[graft] val DefaultMaxBroadcastIdBytes: Long = 64L << 20
  @volatile private[graft] var maxBroadcastIdBytes: Long = DefaultMaxBroadcastIdBytes

  /** The candidate-id set, broadcast-hinted only while its measured size
    * estimate fits [[maxBroadcastIdBytes]]. */
  private def gatedIds(ids: DataFrame): DataFrame =
    if (org.apache.spark.sql.GraftSqlBridge.sizeEstimate(ids) <=
        BigInt(maxBroadcastIdBytes)) broadcast(ids)
    else ids

  /** Exact dedup: keep the lowest-id row per identical `keyCols` tuple.
    * One hash-shuffle on the group key; at 100 TB pre-hash the key
    * (fingerprint64) so the shuffle key is a fixed-width long. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Group stats per identical text. Groups on the 64-bit fingerprint of
    * the raw text, not the text itself — at 100 TB the shuffle keys are
    * fixed-width longs instead of document bodies (collision odds
    * ~n²/2^64: harmless at any realistic corpus size). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("__fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** MinHash + LSH near-duplicate pairs with exact Jaccard verification.
    *
    * shingle → row-local minhash signature ([[graft.functions.minhash_sig]]
    * — one codegen'd pass per document, NO explode/aggregate/shuffle for
    * the signature stage) → band(bands) → bucket self-join → exact verify.
    * With r = numHashes/bands rows per band, the probability of missing a
    * pair at Jaccard j is (1 - j^r)^bands — at the defaults (128/32 ⇒ r=4)
    * and j=0.8 that is ~5e-8, so the verified output is the exact set of
    * pairs with jaccard >= threshold (w.h.p.).
    *
    * Output: (doc_a, doc_b, jaccard) with doc_a < doc_b.
    */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands

    val sh = graft.core.GraftSession.widen(df)
      .select(col(idCol).cast("long").as("doc_id"),
        shingle_hashes(col(textCol), shingleSize).as("sh"))

    val sig = sh.select(col("doc_id"),
      minhash_sig(col("sh"), numHashes).as("mh"))

    val bandStructs = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => element_at(col("mh"), i + 1)) :+ lit(b)
      struct(lit(b).as("band"), xxhash64(cols: _*).as("sig"))
    }
    val bucketed = sig.select(col("doc_id"),
      explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))

    // bucket-local pair generation: ONE shuffle (the groupBy) instead of a
    // self-join's two + sorts; only buckets that actually collide survive
    // the size>1 filter, and near-dup buckets are tiny by construction (a
    // bucket of B docs means B near-identical documents). A pathological
    // mega-bucket means mass duplication of one document — cap upstream
    // with exact dedup, or salt the band hash.
    val cand = bucketed.groupBy(col("band"), col("sig"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(pairCombos(col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()

    verifyJaccard(cand, ids => shingleProjection(
      df.join(gatedIds(ids), df(idCol).cast("long") === ids("doc_id"), "left_semi"),
      idCol, textCol, shingleSize), threshold)
  }

  /** All i<j pairs of a SORTED array as struct(a, b) — evaluated per
    * colliding bucket only (post size>1 filter), so the interpreted HOF
    * touches a handful of rows. */
  private def pairCombos(xs: Column): Column =
    flatten(transform(xs, (x, i) =>
      transform(slice(xs, i + lit(2), greatest(size(xs) - i - 1, lit(0))),
        y => struct(x.as("a"), y.as("b")))))

  /** Exact Jaccard for candidate (doc_a, doc_b) pairs against SORTED
    * shingle-hash sets ([[graft.functions.shingle_hashes]] output): a
    * merge-pass intersection count per pair, no per-row hash set.
    *
    * The naive formulation joined `cand` against the corpus-wide shingle
    * projection twice, re-tokenizing and re-hashing EVERY document per
    * branch (measured: ~2/3 of minhashLsh wall time at sf0.1). Candidates
    * are a tiny reduced artifact, so instead: pin them once
    * ([[graft.core.GraftSession.pin]] — cached + eagerly materialized,
    * lineage KEPT so a lost executor recomputes instead of failing the
    * job), and build the verification shingle sets through `shOfIds` —
    * callers with the RAW table in scope semi-join it down to the
    * candidate ids BEFORE applying the shingle kernel (Catalyst does not
    * push a semi join below a Project, so doing it in the plan would run
    * the kernel corpus-wide a second time; measured 2× the map cost).
    * The corpus-wide kernel pass then happens exactly once, in candidate
    * generation. The materialized frames carry exact sizes, so broadcast
    * decisions stay automatic (and correctly don't broadcast at 100 TB
    * candidate volumes — no forced hints). */
  private def verifyJaccard(
      cand0: DataFrame,
      shOfIds: DataFrame => DataFrame,
      threshold: Double): DataFrame = {
    val cand = graft.core.GraftSession.pin(cand0)
    val ids = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val shC = graft.core.GraftSession.pin(shOfIds(ids))
    cand
      .join(shC.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shC.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter", graft.functions.sorted_intersect_count(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Word n-gram Jaccard pairs within a blocking key.
    *
    * Prefix-filtered set-similarity join (AllPairs/PPJoin family): each
    * document indexes only the FIRST `n - ceil(t·n) + 1` of its shingle
    * hashes in the canonical (sorted) order — two sets with jaccard >= t
    * MUST collide on at least one prefix element, so recall is exact while
    * the inverted index shrinks by ~t/(1+t) and candidate pairs by its
    * square. Surviving candidates are pruned further by the length-ratio
    * bound (J <= min(n_a,n_b)/max(n_a,n_b)) and the positional bound
    * (elements after the matched position cap the possible overlap), then
    * verified with an exact sorted-array intersection. Compared to the
    * plain inverted-index + count formulation this replaces the shuffle of
    * every co-occurrence row (Σ per-shingle C(df,2) — 9.4M rows for 5k docs
    * at sf0.1) with a shuffle of just the candidate pairs. The block bounds
    * the quadratic term: at 100 TB, block on a coarse partition (source,
    * near-length bucket, LSH band...) — never globally. */
  def ngramJaccardBlocked(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0, "prefix-filtered jaccard needs a positive threshold")
    // Null surgery as in charNgramPairs: explicit cheap pre-filter keeps
    // semantics; coalesce makes the kernel chain non-nullable so the join's
    // conditions on n can't infer an isnotnull(<kernel>) filter that would
    // re-run the kernel below the widen exchange on the raw scan.
    val sh = graft.core.GraftSession.widen(
        df.filter(col(textCol).isNotNull && col(idCol).isNotNull))
      .select(col(blockCol).as("blk"), col(idCol).cast("long").as("doc_id"),
        shingle_hashes(coalesce(col(textCol), lit("")), shingleSize).as("sh"))
      .withColumn("n", size(col("sh")))
    prefixFilteredPairs(sh, threshold, Some { ids =>
      val raw = df.filter(col(textCol).isNotNull && col(idCol).isNotNull)
      graft.core.GraftSession.widen(
          raw.join(gatedIds(ids),
            raw(idCol).cast("long") === ids("doc_id"), "left_semi"))
        .select(col(idCol).cast("long").as("doc_id"),
          shingle_hashes(coalesce(col(textCol), lit("")), shingleSize).as("sh"))
    })
  }

  /** Directed containment join (quote / subset detection): pairs
    * (doc_a, doc_b) where at least `threshold` of doc_a's shingles also
    * occur in doc_b — C(a→b) = |A∩B| / |A| ≥ t. Containment is the dedup
    * signal jaccard misses: a paragraph quoted inside a much longer page
    * has tiny jaccard (|A∩B| / |A∪B| shrinks with the container) but
    * containment ≈ 1, so the jaccard PPJoin's length-ratio prune is
    * UNSOUND here and is not used. The prune that IS sound is the
    * asymmetric prefix filter: if C ≥ t, fewer than ⌈t·n_a⌉ of A's
    * shingles can be missing from B, so among A's first
    * n_a − ⌈t·n_a⌉ + 1 shingles (canonical sorted order) at least one is
    * in B. A therefore explodes only that prefix (~(1−t)·n_a elements);
    * B explodes all shingles (it's the container side — every shingle is
    * a potential match point); candidates are the (prefix × index)
    * collisions and an exact merge-pass intersect verifies. Work scales
    * with collisions inside a block, never corpus²  — at 100 TB block on
    * source / LSH band / length bucket exactly as the jaccard joins do. */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      "containment threshold must be in (0, 1]")
    val sh = graft.core.GraftSession.widen(
        df.filter(col(textCol).isNotNull && col(idCol).isNotNull))
      .select(col(blockCol).as("blk"), col(idCol).cast("long").as("doc_id"),
        shingle_hashes(coalesce(col(textCol), lit("")), shingleSize).as("sh"))
      .withColumn("n", size(col("sh")))
    // epsilon only ever LENGTHENS the prefix (recall-safe, as in PPJoin)
    val pLen = col("n") -
      ceil(col("n").cast("double") * lit(threshold) - lit(1e-9)).cast("int") +
      lit(1)
    val prb = sh.select(col("blk"), col("doc_id").as("a_id"),
      explode(slice(col("sh"), lit(1), pLen)).as("g"))
    // slice(sh, 1, n) == sh, but keeps the generate's inferred size()>0
    // guard a TWO-attribute condition — a bare explode(sh) lets Catalyst
    // collapse it to size(<kernel>) > 0 and push the kernel into the
    // raw-scan Filter (the anti-pattern PLANS.md flags)
    val idx = sh.select(col("blk"), col("doc_id").as("b_id"),
      explode(slice(col("sh"), lit(1), col("n"))).as("g"))
    val cand = prb.join(idx, Seq("blk", "g"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val arr = sh.select(col("doc_id"), col("sh"), col("n"))
    cand
      .join(arr.select(col("doc_id").as("a_id"), col("sh").as("sh_a"),
        col("n").as("n_a")), "a_id")
      .join(arr.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), "b_id")
      .withColumn("inter", sorted_intersect_count(col("sh_a"), col("sh_b")))
      .filter(col("inter").cast("double") >=
        col("n_a").cast("double") * lit(threshold) - lit(1e-9))
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"),
        (col("inter").cast("double") / col("n_a").cast("double"))
          .as("containment"))
  }

  /** PPJoin core shared by the word- and char-shingle similarity joins:
    * input is (blk, doc_id, sh = SORTED distinct shingle hashes, n = |sh|),
    * output (doc_a, doc_b, jaccard) with jaccard >= threshold, exact. */
  private[graft] def prefixFilteredPairsForProfile(
      sh: DataFrame, threshold: Double): DataFrame =
    prefixFilteredPairs(sh, threshold)

  /** Oversized blocks denser than this (measured fraction of sampled pairs
    * that are true near-dups) run exact triangle all-pairs instead of the
    * prefix-filtered join: in a dense near-dup set prefix pruning is
    * impossible in principle — the output itself is ~density·b² — and the
    * PPJoin candidate-instance blowup (pairs × shared-prefix grams) costs
    * an order of magnitude more than evaluating the pairs directly
    * (measured on the 10×-sf0.1 stress hot block: ~48 s PPJoin vs ~5 s
    * triangle for the same 460 k exact pairs). Sparse collision blocks
    * (unrelated content behind one block key) stay on PPJoin, where
    * pruning kills ~everything. */
  private[graft] val DenseDispatchDensity = 1e-3

  /** At most this many oversized blocks get a density probe (one ~256-row
    * sample collect each); blocks beyond it default to the PPJoin path.
    * Oversized blocks are anomalies by contract — this bounds driver work
    * if a degenerate block key shatters the corpus. */
  private[graft] val MaxProbedHotBlocks = 64

  /** Measured near-dup density of one oversized block: a deterministic
    * ~256-doc hash sample (no sort, no window), pairs evaluated on the
    * driver with the exact ratio/threshold predicate of the pair join.
    * ~33 k tiny merge-intersects — microseconds; the collect is bounded
    * (E[256]·|grams| longs). */
  private[graft] def blockDensity(
      block: DataFrame, b: Long, threshold: Double): Double = {
    val k = math.max(1L, b / 256L)
    val sample = block
      .filter(pmod(xxhash64(col("doc_id")), lit(k)) === 0)
      .select(col("doc_id"), col("sh"), col("n")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getInt(2)))
    if (sample.length < 2) return 0.0
    var hits = 0L; var total = 0L
    var i = 0
    while (i < sample.length) {
      var j = i + 1
      while (j < sample.length) {
        val (_, ga, na) = sample(i); val (_, gb, nb) = sample(j)
        total += 1
        if (na.toDouble >= nb * threshold - 1e-9 &&
            nb.toDouble >= na * threshold - 1e-9) {
          val alpha = threshold / (1.0 + threshold) * (na + nb) - 1e-9
          val inter = mergeIntersectAtLeast(ga, gb, alpha)
          if (inter >= 0) {
            val jac = inter.toDouble / (na + nb - inter).toDouble
            if (jac >= threshold) hits += 1
          }
        }
        j += 1
      }
      i += 1
    }
    hits.toDouble / total.toDouble
  }

  /** Two-pointer multiplicity-respecting sorted intersect, identical to
    * [[graft.functions.TextScan.sortedIntersectCount]], plus a provable
    * early exit: once `inter + min(remaining)` cannot reach `alpha` (the
    * intersect size jaccard ≥ t requires, minus 1e-9 slack so double
    * rounding never drops a borderline pair) the pair is provably below
    * threshold and -1 is returned. A non-negative return is the EXACT
    * intersect count — bit-identical downstream jaccard. */
  private[graft] def mergeIntersectAtLeast(
      a: Array[Long], b: Array[Long], alpha: Double): Int = {
    var ia = 0; var ib = 0; var inter = 0
    while (ia < a.length && ib < b.length) {
      if (inter + math.min(a.length - ia, b.length - ib) < alpha) return -1
      val x = a(ia); val y = b(ib)
      if (x == y) { inter += 1; ia += 1; ib += 1 }
      else if (x < y) ia += 1
      else ib += 1
    }
    inter
  }

  /** Exact all-pairs jaccard over ONE dense oversized block via triangle
    * (chunk-pair) partitioning: each doc gets a deterministic chunk id
    * (seeded id mix, `s` chunks) and is shipped to the `s` tasks pairing
    * its chunk with every chunk — one task per unordered chunk pair, so
    * the block's inherent b²/2 pair evaluations spread evenly over
    * s(s+1)/2 tasks instead of serializing in one sort-merge task (a
    * 10 k-doc dense block is ~50 M evals). `s` is sized so a task stays
    * ~1 M evaluations and a chunk ≤ 8192 docs (task memory is two chunks
    * of gram arrays); data replication is s× — inherent to distributing a
    * quadratic, and the dense case is exactly where output ~ density·b²
    * already dwarfs it. Every pair is evaluated with the SAME predicate
    * chain as the declarative join (ratio epsilons, exact merge intersect
    * via [[mergeIntersectAtLeast]], same jaccard division) so the output
    * is bit-identical to the all-pairs/PPJoin formulations; each unordered
    * pair lands in exactly one task (its chunk pair), ids normalized
    * doc_a < doc_b. */
  private[graft] def triangleBlockPairs(
      block: DataFrame, threshold: Double, b: Long): DataFrame = {
    val spark = block.sparkSession
    import spark.implicits._
    val s = triangleChunks(b)
    val thr = threshold
    triangleChunkGroups(block, s).flatMapGroups { (key, it) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      trianglePairLoop(key, s, it, thr, (a, bId, jac) => out += ((a, bId, jac)))
      out.iterator
    }.toDF("doc_a", "doc_b", "jaccard")
  }

  /** Counts-only triangle: the SAME chunk-pair evaluation, but each task
    * emits one count instead of buffering density·b² wide pair tuples —
    * the pair-EMISSION cost (buffer, serialize, union, downstream
    * consumption) drops out entirely; only the inherent pair evaluations
    * remain. Output: one row, `n_pairs`. */
  private[graft] def triangleBlockCounts(
      block: DataFrame, threshold: Double, b: Long): DataFrame = {
    val spark = block.sparkSession
    import spark.implicits._
    val s = triangleChunks(b)
    val thr = threshold
    triangleChunkGroups(block, s).mapGroups { (key, it) =>
      var cnt = 0L
      trianglePairLoop(key, s, it, thr, (_, _, _) => cnt += 1)
      cnt
    }.toDF("cnt").agg(coalesce(sum(col("cnt")), lit(0L)).as("n_pairs"))
  }

  /** Chunks per side: a task stays ~1M pair evaluations, a chunk ≤ 8192
    * docs (task memory is two chunks of gram arrays). */
  private def triangleChunks(b: Long): Int =
    math.max(math.ceil(b / 8192.0),
      math.ceil(math.sqrt(b.toDouble * b / 1e6))).toInt.max(1)

  /** Chunk-pair grouping shared by the pair and counts triangle modes:
    * each doc is replicated to the `s` tasks pairing its chunk with every
    * chunk, keyed by the unordered chunk-pair id. */
  private def triangleChunkGroups(block: DataFrame, s: Int):
      org.apache.spark.sql.KeyValueGroupedDataset[Int, (Int, Int, Long, Array[Long], Int)] = {
    val spark = block.sparkSession
    import spark.implicits._
    block.select(col("doc_id"), col("sh"), col("n"))
      .as[(Long, Array[Long], Int)]
      .flatMap { case (id, g, n) =>
        val c = (java.lang.Long.remainderUnsigned(
          scala.util.hashing.byteswap64(id), s.toLong)).toInt
        (0 until s).iterator.map { k =>
          (math.min(c, k) * s + math.max(c, k), c, id, g, n)
        }
      }.groupByKey(_._1)
  }

  /** One chunk-pair task's pair evaluations (see [[triangleBlockPairs]]
    * for the partitioning/predicate contract): `emit` receives each
    * passing (doc_a, doc_b, jaccard) with doc_a < doc_b, in deterministic
    * order — identical arithmetic in both modes. */
  private def trianglePairLoop(
      key: Int,
      s: Int,
      it: Iterator[(Int, Int, Long, Array[Long], Int)],
      thr: Double,
      emit: (Long, Long, Double) => Unit): Unit = {
    val ti = key / s; val tj = key % s
    val buf = it.toArray
    val xs = buf.filter(_._2 == ti).map(r => (r._3, r._4, r._5))
      .sortBy(r => (r._3, r._1))
    val ys = if (ti == tj) xs
      else buf.filter(_._2 == tj).map(r => (r._3, r._4, r._5))
        .sortBy(r => (r._3, r._1))
    var i = 0
    var jLo = 0
    while (i < xs.length) {
      val (ida, ga, na) = xs(i)
      // sorted-by-n window: advance the lower bound once per i (ys is
      // n-ascending), stop the inner scan at the ratio upper bound —
      // the exact predicate is still re-checked per pair
      while (jLo < ys.length && ys(jLo)._3 < na * thr - 1e-9) jLo += 1
      var j = if (ti == tj) math.max(jLo, i + 1) else jLo
      var go = true
      while (go && j < ys.length) {
        val (idb, gb, nb) = ys(j)
        if (na.toDouble < nb * thr - 1e-9) go = false
        else if (ida != idb &&
            na.toDouble >= nb * thr - 1e-9 &&
            nb.toDouble >= na * thr - 1e-9) {
          val alpha = thr / (1.0 + thr) * (na + nb) - 1e-9
          val inter = mergeIntersectAtLeast(ga, gb, alpha)
          if (inter >= 0) {
            val jac = inter.toDouble / (na + nb - inter).toDouble
            if (jac >= thr)
              emit(math.min(ida, idb), math.max(ida, idb), jac)
          }
        }
        j += 1
      }
      i += 1
    }
  }

  /** `shOfIds`, when given, rebuilds the verification sets from the RAW
    * table restricted to the candidate ids (kernel AFTER the semi join) —
    * see [[verifyJaccard]]; the default restricts the already-computed
    * projection, re-running its kernel corpus-wide. */
  private def prefixFilteredPairs(
      sh: DataFrame,
      threshold: Double,
      shOfIds: Option[DataFrame => DataFrame] = None): DataFrame =
    verifyJaccard(prefixCandidates(sh, threshold),
      shOfIds.getOrElse(ids => sh.select(col("doc_id"), col("sh"))
        .join(gatedIds(ids), Seq("doc_id"), "left_semi")), threshold)

  /** Candidate pairs of the PPJoin core before exact verification —
    * exposed for specs that pin the pruning (candidate count ≪ all-pairs
    * on an adversarial block). */
  private[graft] def prefixCandidates(sh: DataFrame, threshold: Double): DataFrame = {
    // Asymmetric (PPJoin) prefixes. For a qualifying pair the required
    // overlap is a = t/(1+t)·(na+nb); with the probe doc the SHORTER of
    // the pair (nx <= ny) that gives a >= 2t/(1+t)·nx on the probe side
    // and (via the length filter ny <= nx/t … nx >= t·ny) a >= t·ny on
    // the index side. So the probe only explodes its first
    // n - ceil(2t/(1+t)·n) + 1 elements and the index its first
    // n - ceil(t·n) + 1 — recall stays exact while candidate multiplicity
    // drops by ~2-3x vs symmetric prefixes (measured: 4.5M -> 1.6M
    // instances at sf0.1/t=0.5). Epsilons only ever LENGTHEN a prefix (fp
    // noise shortening one would cost recall).
    val pIdx = (col("n") -
      ceil(col("n").cast("double") * lit(threshold) - lit(1e-9)).cast("int") + lit(1))
    val pPrb = (col("n") -
      ceil(col("n").cast("double") * lit(2 * threshold / (1 + threshold)) - lit(1e-9))
        .cast("int") + lit(1))
    val idx = sh.select(col("blk"), col("doc_id"), col("n"),
      posexplode(slice(col("sh"), lit(1), pIdx)).as(Seq("pos", "g")))
    val prb = sh.select(col("blk"), col("doc_id"), col("n"),
      posexplode(slice(col("sh"), lit(1), pPrb)).as(Seq("pos", "g")))
    // J <= min(na,nb)/max(na,nb): unequal-length pairs can never pass
    val ratioOk =
      col("x.n").cast("double") >= col("y.n") * threshold - 1e-9 &&
        col("y.n").cast("double") >= col("x.n") * threshold - 1e-9
    // overlap needed for J >= t is a = t/(1+t)·(na+nb); the elements at or
    // after the matched (sorted) position bound the overlap still reachable
    val alpha = (col("x.n") + col("y.n")).cast("double") *
      lit(threshold / (1.0 + threshold)) - lit(1e-9)
    val posOk = (lit(1) +
      least(col("x.n") - col("x.pos") - 1, col("y.n") - col("y.pos") - 1))
      .cast("double") >= alpha
    // probe role = (shorter, then smaller id); ids normalized on output
    val roleOk = col("x.n") < col("y.n") ||
      (col("x.n") === col("y.n") && col("x.doc_id") < col("y.doc_id"))
    prb.as("x").join(idx.as("y"),
        col("x.blk") === col("y.blk") && col("x.g") === col("y.g") &&
          roleOk && ratioOk && posOk)
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
  }

  /** Incremental near-dup detection: MinHash-LSH pairs BETWEEN an indexed
    * corpus and a new delta batch (the daily-crawl-vs-existing-corpus
    * shape) — never within either side, so a delta of size d against a
    * corpus of size N costs bucket joins on d's collisions, not N²
    * self-join work. Same banding/verification machinery as [[minhashLsh]]
    * (and identical pair semantics when the two sides partition one
    * corpus); at 100 TB persist the index side's band buckets once and
    * join each day's delta against them.
    *
    * Output: (doc_a = index id, doc_b = delta id, jaccard). Ids must be
    * disjoint across the two inputs. */
  def minhashLshAgainst(
      index: DataFrame,
      delta: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    def shOf(df: DataFrame) = shingleProjection(df, idCol, textCol, shingleSize)
    def bucketsOf(sh: DataFrame) = bandBuckets(sh, numHashes, bands)
    val shI = shOf(index)
    val shD = shOf(delta)
    // cross-side-only candidates: an equi-join on the band bucket (no
    // same-side pairs by construction — the sides are different relations)
    val cand = bucketsOf(shI).as("i")
      .join(bucketsOf(shD).as("d"), Seq("band", "sig"))
      .select(col("i.doc_id").as("doc_a"), col("d.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cand, ids => {
      def restricted(raw: DataFrame) = shingleProjection(
        raw.join(gatedIds(ids),
          raw(idCol).cast("long") === ids("doc_id"), "left_semi"),
        idCol, textCol, shingleSize)
      restricted(index).unionByName(restricted(delta))
    }, threshold)
  }

  /** Shared (doc_id, sh) projection of the minhash family. */
  private[graft] def shingleProjection(
      df: DataFrame, idCol: String, textCol: String, shingleSize: Int): DataFrame =
    graft.core.GraftSession.widen(df)
      .select(col(idCol).cast("long").as("doc_id"),
        shingle_hashes(col(textCol), shingleSize).as("sh"))

  /** Shared band-bucket projection: (doc_id, band, sig). */
  private[graft] def bandBuckets(sh: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val r = numHashes / bands
    val sig = sh.select(col("doc_id"), minhash_sig(col("sh"), numHashes).as("mh"))
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => element_at(col("mh"), i + 1)) :+ lit(b)
      struct(lit(b).as("band"), xxhash64(cols: _*).as("sig"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
  }

  /** Generation machinery for the catalog-table minhash index — the
    * [[graft.core.GenDir]] discipline expressed in table names: the
    * physical tables of generation N are `<table>_sh__gN` /
    * `<table>_buckets__gN`, a generation is COMMITTED by the single
    * atomic `graft.committed` property flip on its buckets table (which
    * also carries the banding params and counters, so data + metadata
    * publish together), and the live generation is the highest committed
    * one. A rebuild stages generation N+1 beside N and publishes with
    * that one ALTER — the live tables never move, so concurrent readers
    * never fail, never need a relation-cache/FileStatusCache refresh
    * (new generations are new names and new paths), and never see a
    * mixed state (every operation resolves ONCE and derives both table
    * names from the same generation). Grace keeps one generation back
    * for in-flight scans. */
  private def minhashGenTables(table: String, gen: Int): (String, String) =
    // generation -1 is the PRE-GENERATION legacy layout (round ≤ 11):
    // unsuffixed table names. It participates in the normal grace/sweep
    // lifecycle — the first rebuild over it publishes __g0, the publish
    // after that drops the legacy tables.
    if (gen < 0) (s"${table}_sh", s"${table}_buckets")
    else (s"${table}_sh__g$gen", s"${table}_buckets__g$gen")

  /** All generations of the index, with their committed flag. A legacy
    * unsuffixed index (identified by its banding properties) reports as
    * generation -1, committed. */
  private def minhashGens(
      spark: SparkSession, table: String): Seq[(Int, Boolean, Long)] = {
    val cat = spark.sessionState.catalog
    val prefix = s"${table}_buckets__g"
    val gens = cat.listTables(cat.getCurrentDatabase, s"$prefix*").flatMap { ti =>
      ti.table.stripPrefix(prefix).toIntOption.map { g =>
        val props = cat.getTableMetadata(ti).properties
        // graft.committedAt stamps the publish; tables from before the
        // time-grace era read 0 — always past any scan age, so they fall
        // back to the count rule alone (the old behavior)
        (g, props.get("graft.committed").contains("true"),
          props.get("graft.committedAt").flatMap(_.toLongOption).getOrElse(0L))
      }
    }
    val legacyId = org.apache.spark.sql.catalyst.TableIdentifier(s"${table}_buckets")
    val legacy =
      cat.tableExists(legacyId) &&
        cat.getTableMetadata(legacyId).properties.contains("graft.shingleSize")
    if (legacy) gens :+ ((-1, true, 0L)) else gens
  }

  /** The live generation and its properties (from the buckets table —
    * the single publish object, so props and table names are one
    * consistent snapshot). */
  private[graft] def minhashResolve(
      spark: SparkSession, table: String): (Int, Map[String, String]) = {
    val committed = minhashGens(spark, table).collect { case (g, true, _) => g }
    if (committed.isEmpty) throw new IllegalArgumentException(
      s"$table is not a graft minhash index (no committed generation)")
    val gen = committed.max
    val props = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        minhashGenTables(table, gen)._2)).properties
    (gen, props)
  }

  /** Resolved live table names — (sh, buckets) — for direct readers
    * (specs, plan audits). */
  private[graft] def minhashLiveTables(
      spark: SparkSession, table: String): (String, String) =
    minhashGenTables(table, minhashResolve(spark, table)._1)

  /** Drop generations left behind by a publish: committed ones older
    * than the grace window (one behind `newGen`) and uncommitted debris
    * below `newGen` (crashed rebuilds). */
  private def minhashDropOldGens(
      spark: SparkSession, table: String, newGen: Int): Unit =
    // the grace/debris selection is graft.core.GenDir's — ONE policy for
    // the path-backed and the catalog-table index layouts
    graft.core.GenDir.toDrop(minhashGens(spark, table), newGen,
        System.currentTimeMillis(),
        graft.core.GenDir.maxScanAgeMs(spark),
        graft.core.GenDir.maxTimeKeptGens(spark)).foreach { g =>
      val (sh, bk) = minhashGenTables(table, g)
      Bucketing.dropTableAndLocation(spark, sh)
      Bucketing.dropTableAndLocation(spark, bk)
    }

  /** Drop the whole index (every generation + any pre-generation legacy
    * tables) — the cleanup hook fixtures and streaming gates use. */
  def dropMinhashIndex(spark: SparkSession, table: String): Unit = {
    minhashGens(spark, table).foreach { case (g, _, _) =>
      val (sh, bk) = minhashGenTables(table, g)
      Bucketing.dropTableAndLocation(spark, sh)
      Bucketing.dropTableAndLocation(spark, bk)
    }
    spark.sql(s"DROP TABLE IF EXISTS ${table}_sh")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_buckets"): Unit
  }

  /** Persist the INDEX side of [[minhashLshAgainst]] ONCE, as bucketed
    * tables — the daily-crawl shape done right at 100 TB: the corpus is
    * tokenized, minhashed and banded exactly once, here; every later
    * delta join reads the stored layout instead of re-running the kernel
    * pipeline over the whole corpus.
    *
    *  - `<table>_sh__gN` (doc_id, sh): the verification shingle sets,
    *    bucketed by doc_id;
    *  - `<table>_buckets__gN` (doc_id, band, sig): the band buckets,
    *    bucketed by the candidate join key (band, sig) — the delta join
    *    shuffles ONLY the delta's buckets into this layout; no exchange
    *    ever sits above the index scan (spec-asserted).
    *
    * `N` is the committed generation ([[minhashResolve]]); writing over
    * an existing index publishes a fresh generation reader-atomically.
    * Banding parameters are recorded as table properties and VALIDATED at
    * query time ([[minhashLshAgainstIndex]]), so an index built with a
    * different signature scheme fails loudly instead of silently missing
    * candidates. */
  def minhashIndexWrite(
      df: DataFrame,
      idCol: String,
      textCol: String,
      table: String,
      shingleSize: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      buckets: Int = 8): Unit = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val spark = df.sparkSession
    val gens = minhashGens(spark, table)
    val gen = if (gens.isEmpty) 0 else gens.map(_._1).max + 1
    val (shT, bkT) = minhashGenTables(table, gen)
    Bucketing.dropTableAndLocation(spark, shT)
    Bucketing.dropTableAndLocation(spark, bkT)
    shingleProjection(df, idCol, textCol, shingleSize)
      .write.bucketBy(buckets, "doc_id").sortBy("doc_id")
      .format("parquet").mode("overwrite").saveAsTable(shT)
    // derive signatures from the STORED shingles: one kernel pass total
    bandBuckets(spark.table(shT), numHashes, bands)
      .write.bucketBy(buckets, "band", "sig")
      .format("parquet").mode("overwrite").saveAsTable(bkT)
    // the publish point: ONE property flip carries banding params,
    // counters AND the committed flag — readers resolve either the old
    // generation or this one, both complete
    spark.sql(s"ALTER TABLE $bkT SET TBLPROPERTIES (" +
      s"'graft.shingleSize' = '$shingleSize', " +
      s"'graft.numHashes' = '$numHashes', 'graft.bands' = '$bands', " +
      s"'graft.indexedRows' = '${spark.table(shT)
        .select(col("doc_id")).distinct().count()}', " +
      s"'graft.appendedRows' = '0', 'graft.committed' = 'true', " +
      s"'graft.committedAt' = '${System.currentTimeMillis()}')")
    minhashDropOldGens(spark, table, gen)
  }

  /** Merge a served delta INTO a persisted [[minhashIndexWrite]] index —
    * the step that keeps [[minhashLshAgainstIndex]] complete over time.
    * The serve path generates delta×index candidates ONLY (that is its
    * scale contract: the delta is the only side that shuffles), so pairs
    * between docs in two different UNMERGED deltas are structurally
    * invisible; merging each batch after serving closes the gap — the
    * ScaleStressSpec staleness gate proves serve+merge equals the inline
    * run pair-for-pair, and that skipping the merge measurably drops
    * cross-delta pairs. Banding is data-independent (fixed hash family,
    * no training), so a merged index loses NOTHING vs a rebuild; the
    * [[minhashIndexStaleness]] rebuild recommendation is about bucket-file
    * fragmentation (every append adds one file per bucket), not recall.
    *
    * Exactly-once per `batchId`: a batch already recorded in the table
    * properties is skipped. A batch that FAILED mid-append leaves partial
    * bucket files with no marker — retrying would duplicate them; rebuild
    * the index instead (the tables are derived data; the rebuild is one
    * [[minhashIndexWrite]]). This is the standard non-transactional
    * bucketed-table caveat, stated rather than hidden. */
  def minhashIndexAppend(
      delta: DataFrame,
      idCol: String,
      textCol: String,
      table: String,
      batchId: String): Unit = {
    val spark = delta.sparkSession
    require(batchId.matches("[A-Za-z0-9._-]+"),
      s"minhashIndexAppend: batchId must be a plain token, got '$batchId'")
    val (gen, props) = minhashResolve(spark, table)
    val (shT, bkT) = minhashGenTables(table, gen)
    val (ss, nh, nb) =
      (props.get("graft.shingleSize"), props.get("graft.numHashes"),
        props.get("graft.bands")) match {
        case (Some(a), Some(b), Some(c)) => (a.toInt, b.toInt, c.toInt)
        case _ => throw new IllegalArgumentException(
          s"$table is not a graft minhash index (missing banding properties)")
      }
    val done = props.getOrElse("graft.appendedBatches", "")
      .split(',').filter(_.nonEmpty).toSet
    if (done.contains(batchId)) return
    val shD = shingleProjection(delta, idCol, textCol, ss)
    // same bucket spec as the build: INSERT INTO a bucketed table keeps
    // per-bucket file layout, so the serve join stays bucket-local
    shD.write.mode("append").format("parquet")
      .insertInto(shT)
    bandBuckets(spark.table(shT)
        .join(gatedIds(shD.select(col("doc_id"))), Seq("doc_id"), "left_semi"),
        nh, nb)
      .write.mode("append").format("parquet")
      .insertInto(bkT)
    val appended = props.getOrElse("graft.appendedRows", "0").toLong +
      shD.select(col("doc_id")).distinct().count()
    spark.sql(s"ALTER TABLE $bkT SET TBLPROPERTIES (" +
      s"'graft.appendedRows' = '$appended', " +
      s"'graft.appendedBatches' = '${(done + batchId).toSeq.sorted.mkString(",")}')")
  }

  /** Bucket-file fragmentation past which [[minhashIndexStaleness]]
    * recommends a rebuild: appends ≥ the original build mass mean the
    * bucketed tables carry at least as many append-era files as build-era
    * ones (each append adds one file per bucket), and the serve join's
    * per-task open cost starts tracking batch COUNT instead of data size.
    * Recall is unaffected either way — banding is untrained. */
  val MinhashRebuildFraction = 0.5

  /** Staleness report for a persisted minhash index (the
    * [[graft.operators.Similarity.ivfIndexStaleness]] analog): build-time
    * rows, appended rows, appended fraction, rebuild recommendation. */
  def minhashIndexStaleness(spark: SparkSession, table: String): DataFrame = {
    val props = minhashResolve(spark, table)._2
    val built = props.getOrElse("graft.indexedRows", "0").toLong
    val appended = props.getOrElse("graft.appendedRows", "0").toLong
    val frac = appended.toDouble / math.max(built + appended, 1L)
    spark.createDataFrame(Seq(
      (built, appended, frac, frac > MinhashRebuildFraction)))
      .toDF("built_rows", "appended_rows", "appended_fraction",
        "rebuild_recommended")
  }

  /** Rebuild a fragmented minhash index in place — the operator behind
    * [[minhashIndexStaleness]]'s `rebuild_recommended` (round 10 measured
    * fragmentation; this closes the loop). Banding is untrained, so a
    * rebuild changes NO pair semantics ([[minhashLshAgainstIndex]] results
    * are identical before and after, spec-pinned); what it fixes is the
    * file layout: every [[minhashIndexAppend]] adds one file per bucket to
    * both tables, so after k appends a serve-join task opens k+1 files per
    * bucket — rebuild rewrites each table at ONE file per bucket
    * (repartition by the bucket keys uses the same murmur3 hash family as
    * `bucketBy`, so each write task holds exactly one bucket's rows).
    *
    * Shingles are re-read from the stored `_sh` table — no source text,
    * no kernel pass. Both tables are staged as the NEXT GENERATION
    * ([[minhashResolve]]) and published with one atomic `graft.committed`
    * property flip — the live tables never move, so concurrent readers
    * never fail, need no cache refresh, and never see a mixed generation
    * (SwapAtomicitySpec loops serves through a rebuild); crashed-rebuild
    * debris (uncommitted generation tables) is swept at the next publish.
    * Counters reset: `indexedRows` becomes the full current mass,
    * `appendedRows` 0; `appendedBatches` is CARRIED FORWARD so a late
    * upstream retry of an absorbed batch stays exactly-once instead of
    * re-inserting rows the rebuild already owns. */
  def minhashIndexRebuild(spark: SparkSession, table: String): Unit = {
    val (gen, props) = minhashResolve(spark, table)
    val (shT, bkT) = minhashGenTables(table, gen)
    val (ss, nh, nb) =
      (props.get("graft.shingleSize"), props.get("graft.numHashes"),
        props.get("graft.bands")) match {
        case (Some(a), Some(b), Some(c)) => (a.toInt, b.toInt, c.toInt)
        case _ => throw new IllegalArgumentException(
          s"$table is not a graft minhash index (missing banding properties)")
      }
    val buckets = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(shT))
      .bucketSpec.map(_.numBuckets).getOrElse(8)
    val (shNew, bkNew) = minhashGenTables(table, gen + 1)
    Bucketing.dropTableAndLocation(spark, shNew)
    Bucketing.dropTableAndLocation(spark, bkNew)
    // bucketed READS must be off for the staging writes: the planner sees
    // the source table's bucketing as satisfying the repartition (elides
    // the exchange) yet still scans by file splits, so every write task
    // holds rows of EVERY bucket and emits one file per (task, bucket) —
    // exactly the fragmentation this operator exists to remove. With the
    // scan un-bucketed the repartition lands, each task holds one bucket,
    // and each table comes out at one file per bucket (spec-pinned).
    val bucketedReads = spark.conf.get("spark.sql.sources.bucketing.enabled")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "false")
    try {
      spark.table(shT)
        .repartition(buckets, col("doc_id"))
        .write.bucketBy(buckets, "doc_id").sortBy("doc_id")
        .format("parquet").mode("overwrite").saveAsTable(shNew)
      bandBuckets(spark.table(shNew), nh, nb)
        .repartition(buckets, col("band"), col("sig"))
        .write.bucketBy(buckets, "band", "sig")
        .format("parquet").mode("overwrite").saveAsTable(bkNew)
    } finally spark.conf.set("spark.sql.sources.bucketing.enabled", bucketedReads)
    val total = spark.table(shNew)
      .select(col("doc_id")).distinct().count()
    val carried = props.getOrElse("graft.appendedBatches", "")
    // the publish point: ONE property flip — params, reset counters,
    // carried batch markers and the committed flag land together. No
    // renames, so no rollback window and no relation-cache/
    // FileStatusCache refresh (the round-11 two-cache invalidation dance
    // existed only because the rename moved files under a live name);
    // in-stream maintenance (foreachBatch's cloned session) needs no
    // special-casing for the same reason, though it still runs on
    // batch.sparkSession for catalog-session hygiene
    spark.sql(s"ALTER TABLE $bkNew SET TBLPROPERTIES (" +
      s"'graft.shingleSize' = '$ss', " +
      s"'graft.numHashes' = '$nh', 'graft.bands' = '$nb', " +
      s"'graft.indexedRows' = '$total', " +
      s"'graft.appendedRows' = '0', " +
      s"'graft.appendedBatches' = '$carried', " +
      s"'graft.committed' = 'true', " +
      s"'graft.committedAt' = '${System.currentTimeMillis()}')")
    minhashDropOldGens(spark, table, gen + 1)
  }

  /** [[minhashLshAgainst]] against a persisted [[minhashIndexWrite]]
    * index: identical pair semantics, but the index side arrives
    * pre-bucketed on the join key and pre-shingled for verification —
    * the delta (a day's crawl) is the only side that computes kernels or
    * shuffles. Unlike [[minhashLshAgainst]], ids MAY overlap across
    * index and delta (re-ingestion: a replayed micro-batch whose index
    * append already committed re-serves docs whose own signatures are
    * now indexed — the q159 replay boundary): a doc is never paired
    * with itself, and a doc present on both sides contributes exactly
    * one shingle row to verification (the copies are the same document
    * by the id contract). */
  def minhashLshAgainstIndex(
      delta: DataFrame,
      idCol: String,
      textCol: String,
      table: String,
      threshold: Double = 0.8): DataFrame = {
    val spark = delta.sparkSession
    // one resolve per serve: props and BOTH table names come from the
    // same committed generation, so a rebuild publishing midway can
    // never mix generations inside one operation
    val (gen, props) = minhashResolve(spark, table)
    val (shT, bkT) = minhashGenTables(table, gen)
    val (ss, nh, nb) =
      (props.get("graft.shingleSize"), props.get("graft.numHashes"),
        props.get("graft.bands")) match {
        case (Some(a), Some(b), Some(c)) => (a.toInt, b.toInt, c.toInt)
        case _ => throw new IllegalArgumentException(
          s"$table is not a graft minhash index (missing banding properties)")
      }
    val shD = shingleProjection(delta, idCol, textCol, ss)
    val cand = spark.table(bkT).as("i")
      .join(bandBuckets(shD, nh, nb).as("d"), Seq("band", "sig"))
      .select(col("i.doc_id").as("doc_a"), col("d.doc_id").as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .distinct()
    verifyJaccard(cand, ids =>
      spark.table(shT)
        .join(gatedIds(ids), Seq("doc_id"), "left_semi")
        // an id on BOTH sides must contribute ONE row — the delta copy
        // wins (anti-join against the batch's ids, a micro-batch-sized
        // frame); a duplicated doc row would duplicate verified pairs
        .join(delta.select(delta(idCol).cast("long").as("doc_id")),
          Seq("doc_id"), "left_anti")
        .unionByName(shingleProjection(
          delta.join(gatedIds(ids),
            delta(idCol).cast("long") === ids("doc_id"), "left_semi"),
          idCol, textCol, ss)), threshold)
  }

  /** 64-bit SimHash signature per document over word-shingle hashes —
    * row-local single pass ([[graft.functions.simhash_sig]]), no shuffle. */
  def simhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 2): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      simhash_sig(shingle_hashes(col(textCol), shingleSize)).as("simhash"))

  /** SimHash near-dup pairs at Hamming distance <= maxDist (default 3).
    * Blocking: split the 64-bit signature into (maxDist+1) chunks — any pair
    * within distance maxDist agrees exactly on >= 1 chunk (pigeonhole), so
    * the chunk-equality self-join has full recall. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 2,
      maxDist: Int = 3,
      forceDirect: Boolean = false): DataFrame =
    hammingPairs(simhashSignatures(df, idCol, textCol, shingleSize), maxDist,
      Some(simhashSignatures(hammingProbeSample(df), idCol, textCol, shingleSize)),
      forceDirect)

  /** Pigeonhole banding for a 64-bit signature table (doc_id, simhash):
    * one row per (doc, chunk) with the chunk index and value — any pair
    * within Hamming distance maxDist agrees exactly on ≥ 1 chunk. Shared
    * by the inline self-join below and the persisted
    * [[graft.operators.PhashIndex]] (whose stored layout IS this frame). */
  private[graft] def bandedSignatures(sig: DataFrame, maxDist: Int): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = 64 / chunks
    val chunkStructs = (0 until chunks).map { ci =>
      val v = shiftright(col("simhash"), ci * bitsPer)
        .bitwiseAND(lit((1L << bitsPer) - 1))
      struct(lit(ci).as("ci"), v.as("cv"))
    }
    sig.select(col("doc_id"), col("simhash"),
      explode(array(chunkStructs: _*)).as("ck"))
      .select(col("doc_id"), col("simhash"),
        col("ck.ci").as("ci"), col("ck.cv").as("cv"))
  }

  /** Salt width for the identical-signature pair expansion below: one
    * duplicate group's quadratic pair mass spreads over S(S+1)/2 tasks. */
  private val HammingSaltS = 16

  /** Estimated identical-signature group size above which [[hammingPairs]]
    * diverts to the salted-expansion path. Below it the direct bucket
    * formulation is both correct and CHEAPER (two stages; the salted
    * path's collapse/distinct/joins cost ~2-3× on duplication-free
    * corpora — measured at sf0.1); above it the direct path would expand
    * one viral group's B²/2 pairs inside a single task. `@volatile` test
    * knob (the density-probe dispatch discipline, q81). */
  @volatile private[graft] var hammingSaltMinGroup: Long = 4096L

  /** Per-SIDE group size above which an INTER-group signature pair takes
    * the salted expansion inside [[hammingPairsSalted]]: two mutually-
    * near viral groups (the same meme re-encoded twice, each re-posted
    * 100k times) emit |A|×|B| rows — quadratic only when BOTH sides are
    * viral, so the dispatch keys on the smaller side. One-side-viral
    * pairs stay on the direct join: their output is linear in the viral
    * side and the join distributes it by the small side's rows.
    * `@volatile` test knob (same discipline as [[hammingSaltMinGroup]]). */
  @volatile private[graft] var hammingSaltInterMinSide: Long = 4096L

  /** Deterministic-seed sample rate for the duplicate-group probe —
    * seeded so WHICH path a dataset takes never varies run to run (the
    * bc61540 plan-stability rule). */
  private val HammingProbeRate = 0.02

  /** `sampledSig`, when given, is the SAME signature computation over a
    * [[HammingProbeRate]] sample of the input taken BELOW the kernel
    * (Catalyst does not push Sample under a projection, so probing the
    * full `sig` frame would re-run the signature kernel over the whole
    * corpus — measured ~+0.7 s at sf0.1); both in-repo callers pass it.
    *
    * `forceDirect` skips the duplicate-group probe and pins the direct
    * path — the [[graft.operators.Pipeline]] `forceExact` convention: a
    * caller that KNOWS its corpus carries no viral duplicate group (a
    * pre-deduplicated corpus, a fixture) saves the probe's count job per
    * invocation; the dispatch stays the default for everyone else. */
  private[graft] def hammingPairs(sig: DataFrame, maxDist: Int,
      sampledSig: Option[DataFrame] = None,
      forceDirect: Boolean = false): DataFrame = {
    val docs = sig.select(col("doc_id"), col("simhash"))
    if (forceDirect) return hammingPairsDirect(docs, maxDist)
    // the viral-duplicate dispatch (round 13): a cheap deterministic
    // sample estimates the largest identical-signature group; genuine
    // duplication mass (one payload re-posted 100k times) diverts to the
    // salted expansion, everything else keeps the two-stage direct path
    val probe = sampledSig.getOrElse(
      docs.sample(withReplacement = false, HammingProbeRate, seed = 7L))
    val sampledMax = probe.groupBy(col("simhash")).count()
      .agg(max(col("count"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    val estMax = (sampledMax / HammingProbeRate).toLong
    if (estMax <= hammingSaltMinGroup) hammingPairsDirect(docs, maxDist)
    else hammingPairsSalted(docs, maxDist)
  }

  /** The probe sample for [[hammingPairs]]'s `sampledSig` — taken on the
    * RAW frame so the signature kernel runs over 2 %, not 100 %. */
  private[graft] def hammingProbeSample(df: DataFrame): DataFrame =
    df.sample(withReplacement = false, HammingProbeRate, seed = 7L)

  /** The direct formulation: band every row, bucket-local pairCombos —
    * two stages, optimal when no identical-signature group is large
    * (near-dup buckets are tiny by construction; only DUPLICATION makes
    * them quadratic). */
  private def hammingPairsDirect(docs: DataFrame, maxDist: Int): DataFrame = {
    val blocked = bandedSignatures(docs, maxDist)
    blocked.groupBy(col("ci"), col("cv"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(pairCombos(col("xs"))).as("p"))
      .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        bit_count(col("p.a.simhash").bitwiseXOR(col("p.b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** The salted formulation for duplication-heavy inputs:
    *   1. identical signatures collapse BEFORE banding; each group's
    *      intra pairs (hamming 0 by construction) are generated by a
    *      salted two-level explode — members sliced mod S, every
    *      (slice_i, slice_j) cell its own task after a repartition on
    *      (sig, si, sj), so one viral group's quadratic output spreads
    *      over S(S+1)/2 streaming tasks with no large intermediates;
    *   2. banding + bucket pairCombos runs over DISTINCT signatures only
    *      (bucket sizes bounded by near-dup structure, never by
    *      duplication), yielding signature-level pairs;
    *   3. inter-group pairs expand those over both member sets — with two
    *      streaming joins when at least one side is small (output linear
    *      in the big side, distributed by the small side's rows), and
    *      through the same mod-S slicing as the intra path when BOTH
    *      sides exceed [[hammingSaltInterMinSide]] (a viral×viral pair's
    *      |A|×|B| emission would otherwise land in one join task; sliced,
    *      it spreads over S² (sig_a, sig_b, si, sj) cells).
    * Output contract identical to [[hammingPairsDirect]] (spec-pinned):
    * (doc_a < doc_b, hamming ≤ maxDist), one row per pair. */
  private def hammingPairsSalted(docs: DataFrame, maxDist: Int): DataFrame = {
    val S = HammingSaltS
    val saltCells = array((0 until S).flatMap(i => (i until S).map(j =>
      struct(lit(i).as("si"), lit(j).as("sj")))): _*)
    // one member aggregate serves both paths (the groupBy exchange is
    // reused across its references): size>1 groups drive the intra
    // expansion, the unfiltered frame backs the viral×viral inter slices
    // (a forced-dispatch side can be a singleton signature)
    val memsAll = docs.groupBy(col("simhash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ms"))
    val groups = memsAll.filter(size(col("ms")) > 1)
    val intra = groups
      .select(col("simhash"), col("ms"), explode(saltCells).as("s"))
      .select(col("simhash"), col("s.si").as("si"), col("s.sj").as("sj"),
        filter(col("ms"), (_, k) => pmod(k, lit(S)) === col("s.si")).as("mi"),
        filter(col("ms"), (_, k) => pmod(k, lit(S)) === col("s.sj")).as("mj"))
      .repartition(col("simhash"), col("si"), col("sj"))
      .select(col("si"), col("sj"), col("mj"), explode(col("mi")).as("x"))
      .select(col("x"), explode(when(col("si") === col("sj"),
          filter(col("mj"), y => y > col("x")))
        .otherwise(col("mj"))).as("y"))
      .select(least(col("x"), col("y")).as("doc_a"),
        greatest(col("x"), col("y")).as("doc_b"),
        lit(0).as("hamming"))
    if (maxDist == 0) intra
    else {
      // signature-level candidate pairs over the distinct signatures
      val uniq = docs.select(col("simhash")).distinct()
        .select(col("simhash").as("doc_id"), col("simhash"))
      val sigPairs = bandedSignatures(uniq, maxDist)
        .groupBy(col("ci"), col("cv"))
        .agg(sort_array(collect_list(col("doc_id"))).as("xs"))
        .filter(size(col("xs")) > 1)
        .select(explode(pairCombos(col("xs"))).as("p"))
        .select(col("p.a").as("sig_a"), col("p.b").as("sig_b"),
          bit_count(col("p.a").bitwiseXOR(col("p.b"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= maxDist)
      // group sizes are already known at the collapse step: tag each sig
      // pair's two sides so the viral×viral pairs — and only those —
      // divert to the slicing (Catalyst prunes this to a count-only
      // aggregate; the arrays never ride the size join)
      val cnts = memsAll.select(col("simhash"), size(col("ms")).as("gn"))
      val sized = sigPairs
        .join(cnts.select(col("simhash").as("sig_a"), col("gn").as("na")),
          Seq("sig_a"))
        .join(cnts.select(col("simhash").as("sig_b"), col("gn").as("nb")),
          Seq("sig_b"))
      val minSide = hammingSaltInterMinSide
      val small = sized
        .filter(col("na") <= minSide || col("nb") <= minSide)
        .select(col("sig_a"), col("sig_b"), col("hamming"))
      val interSmall = small
        .join(docs.select(col("simhash").as("sig_a"), col("doc_id").as("ida")),
          Seq("sig_a"))
        .join(docs.select(col("simhash").as("sig_b"), col("doc_id").as("idb")),
          Seq("sig_b"))
        .select(least(col("ida"), col("idb")).as("doc_a"),
          greatest(col("ida"), col("idb")).as("doc_b"), col("hamming"))
      val big = sized
        .filter(col("na") > minSide && col("nb") > minSide)
        .select(col("sig_a"), col("sig_b"), col("hamming"))
      // full S×S cells (not the intra path's triangle): the two member
      // sets are disjoint — a doc has ONE signature — so every (si, sj)
      // cell is a distinct slice pair and no self-pair guard is needed
      val fullCells = array((0 until S).flatMap(i => (0 until S).map(j =>
        struct(lit(i).as("si"), lit(j).as("sj")))): _*)
      val mems = memsAll
      val interBig = big
        .join(mems.select(col("simhash").as("sig_a"), col("ms").as("ma")),
          Seq("sig_a"))
        .join(mems.select(col("simhash").as("sig_b"), col("ms").as("mb")),
          Seq("sig_b"))
        .select(col("sig_a"), col("sig_b"), col("hamming"),
          col("ma"), col("mb"), explode(fullCells).as("s"))
        .select(col("sig_a"), col("sig_b"), col("hamming"),
          col("s.si").as("si"), col("s.sj").as("sj"),
          filter(col("ma"), (_, k) => pmod(k, lit(S)) === col("s.si")).as("mi"),
          filter(col("mb"), (_, k) => pmod(k, lit(S)) === col("s.sj")).as("mj"))
        .repartition(col("sig_a"), col("sig_b"), col("si"), col("sj"))
        .select(col("hamming"), col("mj"), explode(col("mi")).as("x"))
        .select(col("hamming"), col("x"), explode(col("mj")).as("y"))
        .select(least(col("x"), col("y")).as("doc_a"),
          greatest(col("x"), col("y")).as("doc_b"), col("hamming"))
      intra.unionByName(interSmall).unionByName(interBig)
    }
  }

  /** Connected components over near-duplicate pairs: every document in a
    * cluster is labeled with the cluster's minimum doc id (its
    * representative) — the step that turns pairwise dedup output into an
    * actionable keep/drop decision.
    *
    * Min-label propagation: labels start as the vertex id and each round
    * takes the min of a vertex's label and its neighbors' labels, until a
    * fixpoint (checked per round, so the loop runs ceil(diameter) times —
    * near-dup clusters are shallow, typically 2-3 rounds). Each round is
    * one aggregate over the edge list; nothing is collected to the driver
    * except the single converged? count. At extreme scale swap in the
    * alternating small-star/large-star formulation (same per-round shape,
    * provably fewer rounds on high-diameter graphs).
    *
    * Small edge sets (≤ `maxLocalEdges`, the same order as a broadcast
    * threshold) skip the loop: the pair list — already a reduced,
    * near-dup-only artifact, tiny relative to the corpus — is collected
    * once and resolved with driver-side union-find, saving 2-3 Spark jobs
    * per propagation round. The distributed loop remains the path for
    * genuinely huge pair sets; both paths produce identical labels.
    *
    * Output: (doc_id, rep) for every vertex that appears in `pairs`. */
  def connectedComponents(
      pairs: DataFrame,
      maxIter: Int = 20,
      maxLocalEdges: Long = 4L << 20): DataFrame = graft.core.GraftSession.pinScope {
    // undirected edge list, both directions
    // pin (persist + count, lineage kept): edge lineage is one distinct over
    // the pair list, so a lost executor recomputes its blocks instead of
    // failing a multi-hour job the way localCheckpoint would. The enclosing
    // pinScope frees the edge blocks the moment the returned frame no
    // longer references them (both exits below).
    val (edges, nEdges) = graft.core.GraftSession.pinCounted(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .distinct())
    if (nEdges <= maxLocalEdges) localComponents(edges)
    else {
      // seed with the first round folded in: label(v) = min(v, neighbors(v)).
      // Plain pair-clusters (the common case) converge immediately — the loop
      // only runs for chains longer than 2.
      var labels = graft.core.GraftSession.pin(edges
        .groupBy(col("dst").as("v")).agg(least(col("dst"), min(col("src"))).as("lbl")))
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        val neighborMin = edges
          .join(labels, edges("src") === labels("v"))
          .groupBy(col("dst").as("v2")).agg(min(col("lbl")).as("nlbl"))
        val next0 = labels.join(neighborMin, col("v") === col("v2"), "left")
          .select(col("v"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        // iterative lineage grows by two joins per round: persist keeps the
        // round fast, and every CheckpointEvery rounds a RELIABLE checkpoint
        // (durable storage, lineage truncated against data executor loss
        // cannot strand) bounds both recompute depth and plan size. This is
        // the FT story groupedPrefixScan already has, applied to the loop.
        val next =
          if ((iter + 1) % CcCheckpointEvery == 0) graft.core.GraftSession.reliableCheckpoint(next0)
          else graft.core.GraftSession.pin(next0)
        val changed = next.as("n").join(labels.as("o"), "v")
          .filter(col("n.lbl") =!= col("o.lbl")).count()
        // the superseded round's labels are provably dead once `next` is
        // materialized — release eagerly so live frames don't scale with
        // loop depth (GC would get them too, just later)
        graft.core.GraftSession.release(labels)
        labels = next
        converged = changed == 0
        iter += 1
      }
      labels.select(col("v").as("doc_id"), col("lbl").as("rep"))
    }
  }

  /** Driver-side union-find over a collected (src, dst) edge list; each
    * vertex labeled with its component's minimum id (identical output to
    * the distributed min-label loop). */
  private def localComponents(edges: DataFrame): DataFrame = {
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // union by min so roots stay component minima
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
      parent.getOrElseUpdate(a, find(a)); parent.getOrElseUpdate(b, find(b))
    }
    val verts = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
    val spark = edges.sparkSession
    import spark.implicits._
    verts.toSeq.sorted.map(v => (v, find(v))).toDF("doc_id", "rep")
  }

  /** End-to-end near-duplicate removal: minhash-LSH pairs → connected
    * components → keep each cluster's minimum-id document, drop the rest.
    * The anti-join ships only the (small) drop list against the corpus —
    * the corpus itself is never shuffled. */
  def dropNearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.8): DataFrame = graft.core.GraftSession.pinScope {
    val pairs = minhashLsh(df, idCol, textCol, shingleSize, numHashes, bands, threshold)
    val drop = connectedComponents(pairs)
      .filter(col("doc_id") =!= col("rep"))
      .select(col("doc_id").as("__drop"))
    df.join(drop, df(idCol).cast("long") === col("__drop"), "left_anti")
  }

  /** [[dropNearDuplicates]] with CURATION semantics: per near-dup cluster
    * keep the best document by `quality` (ties to the smaller id), not
    * the smallest id — dedup should discard the redundant copies, not
    * arbitrarily the later ones. The winner is a per-cluster
    * MAX(struct(quality, -id)) — map-side combinable, one row per
    * cluster reaches the exchange; everything else matches
    * [[dropNearDuplicates]]'s cluster machinery. */
  def dropNearDuplicatesKeepBest(
      df: DataFrame,
      idCol: String,
      textCol: String,
      quality: Column,
      shingleSize: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.8): DataFrame = graft.core.GraftSession.pinScope {
    val pairs = minhashLsh(df, idCol, textCol, shingleSize, numHashes, bands, threshold)
    val cc = connectedComponents(pairs)
    val members = df
      .select(col(idCol).cast("long").as("__id"), quality.cast("double").as("__q"))
      .join(cc, col("__id") === col("doc_id"))
    val winners = members.groupBy(col("rep"))
      .agg(max(struct(col("__q"), (-col("__id")).as("nid"))).as("__w"))
      .select((-col("__w.nid")).as("__keep"))
    val losers = cc.join(winners, cc("doc_id") === col("__keep"), "left_anti")
      .select(col("doc_id").as("__drop"))
    df.join(losers, df(idCol).cast("long") === col("__drop"), "left_anti")
  }

  /** Fingerprint-level dedup summary: distinct normalized docs vs total. */
  def fingerprintSummary(df: DataFrame, textCol: String): DataFrame =
    df.agg(
      countDistinct(fingerprint64(col(textCol))).as("n_unique"),
      count(lit(1)).as("n_docs"))

  /** Character n-gram Jaccard pairs within a block (URL-less CC-style
    * near-dup detection robust to tokenization differences).
    *
    * Deliberately NOT the PPJoin core the word-shingle join uses: prefix
    * filtering needs rare tokens to prune, and char 5-grams are the
    * opposite regime — a bounded, frequency-skewed vocabulary where the
    * head grams appear in nearly every document, so the inverted-index
    * join materializes ~pairs × shared-prefix-grams rows before dedup
    * (measured 16.7s vs 0.6s for the shape below at sf0.1). The scalable
    * design instead bounds the quadratic term by BLOCKING (at 100 TB,
    * block on a fine composite — source × lang × length bucket — never
    * globally) and runs all-pairs inside each block: one shuffle on the
    * block key (computed once and read twice via exchange reuse — both
    * self-join sides canonicalize to the same plan), a length-ratio join
    * filter (|a|/|b| ∈ [t, 1/t] is necessary for jaccard ≥ t), then a
    * pipelined merge-pass intersect over per-doc sorted gram hashes —
    * pairs stream through the sort-merge join and are filtered in the
    * same stage, so the ~|text|-long gram arrays never rest in a second
    * shuffle. Hashing grams to longs once per document replaces
    * string-array intersection per pair (collision odds
    * ~pairs·|grams|²/2^64: negligible). */
  def charNgramPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int = 5,
      threshold: Double = 0.7,
      maxBlockRows: Int = 4096): DataFrame =
    charNgramImpl(df, idCol, textCol, blockCol, n, threshold, maxBlockRows,
      countsOnly = false)

  /** Counts-only [[charNgramPairs]] for the report use case ("how many
    * near-dup pairs?"): identical dispatch, candidate generation, and
    * exact verification, but every branch reduces to a count INSIDE its
    * producing stage — the quadratic pair-EMISSION volume (density·b²
    * wide rows buffered, unioned, and shuffled to the consumer) never
    * materializes. In a dense hot block the output volume is the dominant
    * cost (StressBench splits the two), so dup-rate reporting at 100 TB
    * should take this path and only enumerate pairs when it actually
    * needs the edge list. Output: one row, `n_pairs` = COUNT(*) of the
    * pair mode (spec-pinned equal). */
  def charNgramPairCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int = 5,
      threshold: Double = 0.7,
      maxBlockRows: Int = 4096): DataFrame =
    charNgramImpl(df, idCol, textCol, blockCol, n, threshold, maxBlockRows,
      countsOnly = true)

  private def charNgramImpl(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int,
      threshold: Double,
      maxBlockRows: Int,
      countsOnly: Boolean): DataFrame = {
    require(threshold > 0.0, "ratio-pruned jaccard needs a positive threshold")
    require(maxBlockRows > 0, "maxBlockRows must be positive")
    // The null handling is deliberate plan surgery, not defensiveness: an
    // explicit cheap IsNotNull pre-filter keeps the semantics (null text
    // never pairs), and coalesce makes the shingle chain NON-NULLABLE so
    // constraint propagation cannot infer `isnotnull(...)` from the
    // join's ratio conditions and push the whole kernel below the widen
    // exchange — which would re-run it serially on the raw scan
    // (measured: 15.6s -> the kernel twice on 1 partition; ~2s fixed).
    // The gram stage is the codegen'd char_ngram_hashes kernel over a
    // once-per-row norm_text — the former declarative chain
    // (transform(sequence, i => substring(norm, i, n))) evaluated
    // INTERPRETED (ArrayTransform is codegen-fallback) and re-ran the
    // trim/regexp/lower normalization PER GRAM (no subexpression
    // elimination in interpreted eval) — the r14 q81 flight-recorder
    // finding (profiles: RegExpReplace/Substring nullSafeEval dominate).
    val sh = graft.core.GraftSession.widen(
        df.filter(col(textCol).isNotNull && col(idCol).isNotNull))
      .select(col(blockCol).as("blk"), col(idCol).cast("long").as("doc_id"),
        char_ngram_hashes(norm_text(coalesce(col(textCol), lit(""))), n).as("sh"))
      .withColumn("n", size(col("sh")))
    // SKEW GUARD: the all-pairs join is quadratic in the block size — a
    // hot block (block-key collision: same source×lang×length bucket,
    // unrelated content) would materialize O(b²) wide-row pairs. A
    // column-pruned pre-count (block key only, no shingle work) decides
    // the plan: with no oversized block — the overwhelmingly common case
    // — the pure all-pairs plan runs untouched; otherwise oversized
    // blocks divert to the PPJoin prefix-filtered path: exact same output
    // (verifyJaccard computes the identical sorted-hash intersect), but
    // candidates come from an inverted index with length/prefix/
    // positional pruning instead of b² materialization — dissimilar hot
    // blocks prune to ~nothing.
    val sizes = df.filter(col(textCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(blockCol).as("blk")).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > maxBlockRows)
    // take(1), not limit(1).count(): the terminal take plans
    // CollectLimitExec with no codegen-limit counter, so the probe's
    // generated source is rep-stable and hits the codegen cache —
    // limit(1).count() minted two fresh `_limit_counter_N` stages per
    // invocation and paid 4 Janino compiles every bench rep (round-9
    // q81 attribution)
    val anyHot = sizes.select(lit(1).as("__one")).take(1).nonEmpty
    val ratioOk = col("x.n").cast("double") >= col("y.n") * threshold - 1e-9 &&
      col("y.n").cast("double") >= col("x.n") * threshold - 1e-9
    // merge hint: with both sides hash(blk)-partitioned by identical
    // subplans, the second exchange is a ReusedExchange — the shingle
    // kernel runs ONCE for the self-join instead of once per side.
    def allPairs(side: DataFrame): DataFrame =
      side.as("x").hint("merge").join(side.as("y"),
          col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id") && ratioOk)
        .withColumn("inter", sorted_intersect_count(col("x.sh"), col("y.sh")))
        .withColumn("jaccard", col("inter").cast("double") /
          (col("x.n") + col("y.n") - col("inter")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"), col("jaccard"))
    // counts mode: each branch reduces to one n_pairs row inside its own
    // producing stage (partial-agg pipelines into the join — no pair rows
    // cross a stage boundary); branches then sum driver-free
    def reduced(pairs: DataFrame): DataFrame =
      pairs.agg(count(lit(1)).cast("long").as("n_pairs"))
    if (!anyHot) { if (countsOnly) reduced(allPairs(sh)) else allPairs(sh) }
    else {
      val hot = sizes.select(col("blk"))
      val small = sh.join(broadcast(hot), Seq("blk"), "left_anti")
      // Density-probed dispatch for the oversized blocks (see
      // [[DenseDispatchDensity]]): dense near-dup sets run exact triangle
      // all-pairs, sparse collision blocks — and any block past the probe
      // cap — stay on the prefix-filtered path. Identical output either
      // way; the probe only picks the cheaper exact plan. The probe SET
      // is ordered (size desc, key) — a bare limit() takes whatever
      // partitions answer first, so past the cap the dispatch (and with
      // it the plan's cost) would vary run to run; biggest blocks are
      // exactly the ones where picking the wrong path hurts most
      val probed = sizes
        .orderBy(col("__bn").desc, col("blk"))
        .limit(MaxProbedHotBlocks + 1).collect()
      val capped = probed.length > MaxProbedHotBlocks
      // a null block key never pairs in ANY path (x.blk === y.blk is never
      // true for nulls — and left_anti keeps null rows out of `big` too),
      // so it must not reach the triangle path, which would otherwise
      // invent pairs the declarative formulation cannot emit
      val hotRows = probed.filter(_.get(0) != null).take(MaxProbedHotBlocks)
      val dense = hotRows.filter { r =>
        blockDensity(sh.filter(col("blk") <=> lit(r.get(0))),
          r.getLong(1), threshold) >= DenseDispatchDensity
      }
      val triangles = dense.map { r =>
        val blkDf = sh.filter(col("blk") <=> lit(r.get(0)))
        if (countsOnly) triangleBlockCounts(blkDf, threshold, r.getLong(1))
        else triangleBlockPairs(blkDf, threshold, r.getLong(1))
      }.toSeq
      val sparseSide =
        if (!capped && dense.length == probed.length) None
        else {
          val big = sh.join(broadcast(hot), Seq("blk"), "left_semi")
          val sparseBig =
            if (dense.isEmpty) big
            else big.filter(!dense.map(r => col("blk") <=> lit(r.get(0)))
              .reduce(_ || _))
          // verify sets rebuilt from the RAW table restricted to candidate
          // ids (kernel AFTER the semi join) — candidates only come from
          // the hot blocks, and the char-gram chain is deterministic, so
          // the recompute is exact and never corpus-wide
          Some(prefixFilteredPairs(sparseBig, threshold, Some { ids =>
            val raw = df.filter(col(textCol).isNotNull && col(idCol).isNotNull)
            graft.core.GraftSession.widen(
                raw.join(gatedIds(ids),
                  raw(idCol).cast("long") === ids("doc_id"), "left_semi"))
              .select(col(idCol).cast("long").as("doc_id"),
                char_ngram_hashes(norm_text(coalesce(col(textCol), lit(""))), n)
                  .as("sh"))
          }))
        }
      if (countsOnly)
        (Seq(reduced(allPairs(small))) ++ sparseSide.map(reduced) ++ triangles)
          .reduce(_.unionByName(_))
          .agg(coalesce(sum(col("n_pairs")), lit(0L)).as("n_pairs"))
      else
        (Seq(allPairs(small)) ++ sparseSide ++ triangles).reduce(_.unionByName(_))
    }
  }
}
