package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** graft column-function surface.
  *
  * Everything here composes codegen'd Spark built-ins
  * (`org.apache.spark.sql.functions._`) — no Scala UDFs — so filters and
  * projections built from these stay inside whole-stage codegen and push
  * down to the scan where Catalyst allows.
  *
  * The only custom Catalyst expression is [[graft.functions.HyperLogLogPP]]
  * (the reference's sole custom aggregation, SURVEY.md §2.3); it is
  * registered as SQL function `hyper_log_log` by [[registerAll]].
  */
package object functions {

  /** Every graft SQL function as (name, FunctionRegistry builder) — one
    * table consumed by BOTH installation paths: [[registerAll]] (temp
    * functions on an existing session — the driver's Verify/Bench
    * sessions) and [[graft.GraftExtensions]] (the idiomatic
    * `spark.sql.extensions` injection for sessions we don't construct). */
  val sqlFunctions: Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    Seq(
      "hyper_log_log" -> HyperLogLogPP.builder _,
      "seq_dot" -> { exprs => SeqDot(exprs(0), exprs(1)) },
      "lsh_buckets" -> {
        case Seq(v, Literal(t: Int, _), Literal(p: Int, _), Literal(d: Int, _),
            Literal(th: org.apache.spark.sql.catalyst.util.ArrayData, _)) =>
          LshBuckets(v, t, p, d, th.toDoubleArray.toSeq)
        case _ => throw new IllegalArgumentException(
          "lsh_buckets(vec, tables, planes, dim, thresholds)")
      },
      "bpe_encode" -> {
        case Seq(c, Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData, _)) =>
          val pairs = (0 until arr.numElements()).map { i =>
            val r = arr.getStruct(i, 2)
            (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
          }
          BpeEncode(c, pairs)
        case _ => throw new IllegalArgumentException("bpe_encode(text, merges)")
      },
      "bpe_chain_stats" -> {
        case Seq(c, Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData, _)) =>
          val pairs = (0 until arr.numElements()).map { i =>
            val r = arr.getStruct(i, 2)
            (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
          }
          BpeChainStats(c, pairs)
        case _ => throw new IllegalArgumentException("bpe_chain_stats(text, merges)")
      },
      "bpe_chain_encode" -> {
        case Seq(c, Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData, _)) =>
          val pairs = (0 until arr.numElements()).map { i =>
            val r = arr.getStruct(i, 2)
            (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
          }
          BpeChainEncode(c, pairs)
        case _ => throw new IllegalArgumentException("bpe_chain_encode(text, merges)")
      },
      "lm_surprisal" -> {
        case Seq(c, Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData, _),
            Literal(nv: Long, _)) =>
          val vocab = (0 until arr.numElements()).map { i =>
            val r = arr.getStruct(i, 2)
            (r.getUTF8String(0).toString, r.getLong(1))
          }
          LmSurprisal(c, vocab, nv)
        case _ => throw new IllegalArgumentException("lm_surprisal(text, vocab, nv)")
      },
      "ivf_nearest" -> {
        case Seq(v, Literal(cb: org.apache.spark.sql.catalyst.util.ArrayData, _),
            Literal(nlist: Int, _), Literal(d: Int, _), Literal(take: Int, _)) =>
          IvfNearestLists(v, cb.toDoubleArray.toSeq, nlist, d, take)
        case _ => throw new IllegalArgumentException(
          "ivf_nearest(vec, codebook, nlist, dim, take)")
      },
      "pq_encode" -> {
        case Seq(v, b, Literal(cb: org.apache.spark.sql.catalyst.util.ArrayData, _),
            Literal(pq: org.apache.spark.sql.catalyst.util.ArrayData, _),
            Literal(nlist: Int, _), Literal(d: Int, _), Literal(m: Int, _),
            Literal(ksub: Int, _)) =>
          PqEncode(v, b, cb.toDoubleArray.toSeq, pq.toDoubleArray.toSeq,
            nlist, d, m, ksub)
        case _ => throw new IllegalArgumentException(
          "pq_encode(vec, bucket, coarse, pq, nlist, dim, m, ksub)")
      },
      "pq_adc" -> {
        case Seq(t, c, Literal(m: Int, _), Literal(ksub: Int, _)) =>
          PqAdc(t, c, m, ksub)
        case _ => throw new IllegalArgumentException("pq_adc(tab, codes, m, ksub)")
      },
      "hll_sketch" -> HllSketchAgg.builder _,
      "hll_merge" -> { exprs => HllMergeAgg(exprs.head) },
      "rolling_hash64" -> { exprs => RollingHash64(exprs.head) },
      "minhash_sig" -> {
        case Seq(c, Literal(k: Int, _)) => MinHashSignature(c, k)
        case _ => throw new IllegalArgumentException("minhash_sig(hashArray, k)")
      },
      "simhash_sig" -> { exprs => SimHashSignature(exprs.head) },
      "shingle_hashes" -> {
        case Seq(c, Literal(n: Int, _)) => ShingleHashes(c, n)
        case _ => throw new IllegalArgumentException("shingle_hashes(text, n)")
      },
      "char_ngram_hashes" -> {
        case Seq(c, Literal(n: Int, _)) => CharNgramHashes(c, n)
        case _ => throw new IllegalArgumentException("char_ngram_hashes(normText, n)")
      },
      "lang_guess_scan" -> { exprs => LangGuessScan(exprs.head) },
      "shingle_strings" -> {
        case Seq(c, Literal(n: Int, _)) => ShingleStrings(c, n)
        case _ => throw new IllegalArgumentException("shingle_strings(text, n)")
      },
      "sorted_intersect_count" -> { exprs => SortedIntersectCount(exprs(0), exprs(1)) },
      "bloom_might_contain" -> { exprs => BloomMightContain(exprs(0), exprs(1)) },
      "tokens_scan" -> { exprs => TokensScan(exprs.head) },
      "hashed_ngram_buckets" -> { exprs => HashedNgramBuckets(exprs.head) },
      "ngram_repetition_scan" -> {
        case Seq(c, Literal(n: Int, _)) => NgramRepetitionScan(c, n)
        case _ => throw new IllegalArgumentException("ngram_repetition_scan(text, n)")
      },
      "token_entropy_scan" -> { exprs => TokenEntropyScan(exprs.head) },
      "morton_interleave" -> { exprs => MortonInterleave(exprs(0), exprs(1)) },
      "normalize_text_scan" -> { exprs => NormalizeTextScan(exprs.head) },
      "url_parts" -> { exprs => UrlPartsScan(exprs.head) },
      "url_valid" -> { exprs => UrlValidScan(exprs.head) },
      "html_to_text" -> { exprs => HtmlToTextScan(exprs.head) },
      "maxsim_score" -> {
        case Seq(a, b, Literal(n: Int, _)) => MaxSimScore(a, b, n)
        case _ => throw new IllegalArgumentException("maxsim_score(q, d, subDim)")
      },
      "token_count_scan" -> { exprs => TokenCountScan(exprs.head) },
      "distinct_token_count_scan" -> { exprs => DistinctTokenCountScan(exprs.head) },
      "cms_estimate" -> { exprs => CmsEstimate(exprs(0), exprs(1)) },
      "kmv_sketch" -> {
        case Seq(c, Literal(k: Int, _)) => KmvSketchAgg(c, k)
        case _ => throw new IllegalArgumentException("kmv_sketch(hash64, k)")
      },
      "kmv_jaccard" -> {
        case Seq(a, b, Literal(k: Int, _)) => KmvJaccard(a, b, k)
        case _ => throw new IllegalArgumentException("kmv_jaccard(sketchA, sketchB, k)")
      },
      "kmv_merge" -> {
        case Seq(c, Literal(k: Int, _)) => KmvMergeAgg(c, k)
        case _ => throw new IllegalArgumentException("kmv_merge(sketch, k)")
      },
      "kmv_distinct" -> {
        case Seq(c, Literal(k: Int, _)) => KmvDistinct(c, k)
        case _ => throw new IllegalArgumentException("kmv_distinct(sketch, k)")
      },
      "top_k" -> {
        case Seq(c, Literal(k: Int, _)) => TopKAgg(c, k)
        case _ => throw new IllegalArgumentException("top_k(value, k)")
      },
      "bottom_k" -> {
        case Seq(c, Literal(k: Int, _)) => TopKAgg(c, k, reverse = true)
        case _ => throw new IllegalArgumentException("bottom_k(value, k)")
      })
  }

  /** Register graft SQL functions on a session — idempotent AND quiet:
    * `createOrReplaceTempFunction` on an existing name logs one WARN per
    * function per call, and `registerAll` runs on every GraftSession
    * (re-)configure, so repeated sessions sprayed ~10 WARNs into the
    * driver's bounded tail capture (VERDICT r15 item 6). A name already
    * present is ours (the graft function set is the only writer of these
    * names), so re-registration is skipped instead of replaced. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlFunctions.foreach { case (name, builder) =>
      if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  // ---------------------------------------------------------------- A1/A2

  /** HLL cardinality over pre-hashed 64-bit values; precision in [4,16]. */
  def hyper_log_log(c: Column, precision: Int = HyperLogLogPP.DefaultPrecision): Column =
    call_function("hyper_log_log", c, lit(precision))

  /** Mergeable binary HLL sketch (persist, then roll up with [[hll_merge]]). */
  def hll_sketch(c: Column, precision: Int = HyperLogLogPP.DefaultPrecision): Column =
    call_function("hll_sketch", c, lit(precision))

  /** Merge binary sketches of equal precision → cardinality estimate. */
  def hll_merge(c: Column): Column = call_function("hll_merge", c)

  /** Mergeable KMV sketch over pre-hashed 64-bit values: the k minimum
    * values, kept sorted — distinct-count AND set-overlap estimates
    * between groups from fixed-size state (see [[KmvSketchAgg]]). */
  def kmv_sketch(c: Column, k: Int): Column = call_function("kmv_sketch", c, lit(k))

  /** Estimated Jaccard between two kmv_sketch outputs (equal k). */
  def kmv_jaccard(a: Column, b: Column, k: Int): Column =
    call_function("kmv_jaccard", a, b, lit(k))

  /** Estimated distinct count from a kmv_sketch (exact below k). */
  def kmv_distinct(c: Column, k: Int): Column = call_function("kmv_distinct", c, lit(k))

  /** Cross-job KMV sketch rollup (equal k). */
  def kmv_merge(c: Column, k: Int): Column = call_function("kmv_merge", c, lit(k))

  /** Bounded top-k aggregate: the k LARGEST values of `c` (natural /
    * lexicographic-struct order), emitted descending. Map-side combine
    * ships at most k rows per group per partition — the scale
    * replacement for `row_number` window top-k (see [[TopKAgg]]). */
  def top_k(c: Column, k: Int): Column = call_function("top_k", c, lit(k))

  /** Bounded bottom-k aggregate: the k SMALLEST values, ascending — same
    * heap/merge machinery as [[top_k]] with the comparator flipped, so
    * string/struct orders need no negation tricks. */
  def bottom_k(c: Column, k: Int): Column = call_function("bottom_k", c, lit(k))

  /** 64-bit deterministic hash — the engine-side analog of the reference's
    * serialization-based `hash64` service (`HashingSupport.java:42-74`). */
  def hash64(cols: Column*): Column = xxhash64(cols: _*)

  // ------------------------------------------------------------ text (§ LLM-pipeline)

  /** Whitespace tokenization on the RE2 \\s class [ \\t\\n\\f\\r] —
    * explicit so DuckDB (RE2 excludes vertical tab, Java \\s includes it)
    * replays the exact token boundaries on any input. */
  def tokens(c: Column): Column = split(trim(c), "[ \\t\\n\\f\\r]+")

  /** Byte-level fast path for [[tokens]] (identical values, no regex). */
  def tokens_fast(c: Column): Column = call_function("tokens_scan", c)

  /** Per-doc word n-gram repetition stats (Gopher/MassiveText repetition
    * quality filters): struct(n_ngrams, max_count, dup_count), one
    * row-local byte pass — no shuffle at any corpus size. */
  def ngram_repetition(c: Column, n: Int): Column =
    call_function("ngram_repetition_scan", c, lit(n))

  /** Z-order interleave of two longs (low 31 bits each) — the Morton
    * clustering key for multi-column data skipping. */
  def morton_interleave(a: Column, b: Column): Column =
    call_function("morton_interleave", a, b)

  /** CCNet-style dedup normalization (lowercase, digits→0, punctuation
    * stripped, whitespace collapsed, trimmed) — one row-local pass. */
  def normalize_text(c: Column): Column = call_function("normalize_text_scan", c)

  /** URL parse/canonicalize: struct(scheme, host, registrable_domain,
    * path, qs, canonical_url); null on unparseable input ([[UrlKit]]). */
  def url_parts(c: Column): Column = call_function("url_parts", c)

  /** Boundary-pass URL validity (true ⟺ [[url_parts]] parses): the
    * FILTER-side twin, cheap enough for a pushed predicate. */
  def url_valid(c: Column): Column = call_function("url_valid", c)

  /** HTML → text extraction (script/style/comment drop, tag strip,
    * fixed-entity decode, whitespace normal form — [[HtmlKit]]). */
  def html_to_text(c: Column): Column = call_function("html_to_text", c)

  /** Late-interaction (ColBERT MaxSim) relevance: Σ_i max_j dot(q_i, d_j)
    * over subDim-wide sub-vectors, fixed fold order. */
  def maxsim_score(q: Column, d: Column, subDim: Int): Column =
    call_function("maxsim_score", q, d, lit(subDim))

  /** Per-doc quantized-log token entropy (lexical diversity quality
    * signal): struct(n_tokens, n_distinct, ent_q), one row-local byte
    * pass — integer-exact, no shuffle at any corpus size. */
  def token_entropy(c: Column): Column = call_function("token_entropy_scan", c)

  /** Fused token count — `size(tokens(c))` values with no array build;
    * cheap enough to live in pushed-down Filter predicates. */
  def token_count(c: Column): Column = call_function("token_count_scan", c)

  /** Fused distinct token count — `size(array_distinct(tokens(c)))` values
    * with no token strings built. */
  def distinct_token_count(c: Column): Column =
    call_function("distinct_token_count_scan", c)

  /** BPE-ish subword split: word pieces, digits, and punctuation as tokens. */
  def bpeish_tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)

  /** Whitespace-collapsed, lower-cased normal form used for fingerprinting. */
  def norm_text(c: Column): Column =
    lower(trim(regexp_replace(c, "[ \\t\\n\\f\\r]+", " ")))

  /** 64-bit document fingerprint of the normal form (block hash). */
  def fingerprint64(c: Column): Column = xxhash64(norm_text(c))

  /** Incremental (Rabin–Karp) fingerprint of the normal form — extendable
    * byte-by-byte for streaming ingestion (see [[RollingHash64.roll]]). */
  def rolling_fingerprint64(c: Column): Column =
    call_function("rolling_hash64", norm_text(c))

  /** Count of punctuation characters. */
  def punct_count(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.,;:!?'\"()-]", ""))

  def punct_ratio(c: Column): Column =
    punct_count(c).cast("double") / greatest(length(c), lit(1)).cast("double")

  private val StopWords = Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")

  /** Fraction of tokens that are (English) stopwords. */
  def stopword_ratio(c: Column): Column = {
    val toks = tokens_fast(lower(c))
    val stops = filter(toks, t => t.isInCollection(StopWords))
    size(stops).cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  /** Deterministic quality score in [0,1]: length + cleanliness + stopword mass. */
  def quality_score(c: Column): Column =
    lit(0.3) * least(lit(1.0), token_count(c).cast("double") / lit(100.0)) +
      lit(0.3) * (lit(1.0) - punct_ratio(c)) +
      lit(0.4) * least(lit(1.0), stopword_ratio(c) * lit(4.0))

  /** N-gram-heuristic language guess over a pre-tokenized (lowercased)
    * array column — single pass per marker set via arrays_overlap.
    * "any marker token present" ≡ the oracle's marker-count >= 1. */
  def lang_guess_tokens(toks: Column): Column = {
    def anyOf(ws: String*): Column = arrays_overlap(toks, array(ws.map(lit): _*))
    when(anyOf("der", "und", "das"), "de")
      .when(anyOf("el", "la", "los"), "es")
      .when(anyOf("le", "et", "les"), "fr")
      .when(anyOf("the", "and", "of"), "en")
      .otherwise("und")
  }

  /** N-gram-heuristic language guess. Marker-word matching, deterministic and
    * SQL-replicable (the oracle mirrors the same CASE chain). Prefer
    * projecting `tokens(lower(c))` once and using [[lang_guess_tokens]] when
    * the tokenization is reused. */
  def lang_guess(c: Column): Column = lang_guess_tokens(tokens(lower(c)))

  /** Distinct word n-gram shingles; whole text as single shingle if shorter
    * than n tokens.
    *
    * Built from n shifted slices zipped together (n slices + n-1 zip passes
    * per ROW) rather than a per-element `transform(i -> slice(...))` (which
    * copies a subarray per shingle — ~10x slower interpreted). Output
    * strings are identical: toks[i] + " " + ... + toks[i+n-1]. */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    val m = size(toks) - (n - 1) // number of shingles
    val shifted = (0 until n).map(i => slice(toks, lit(i + 1), m))
    val joined = shifted.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    when(size(toks) >= n, array_distinct(joined))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Distinct character n-gram shingles. */
  def char_shingles(c: Column, n: Int): Column = {
    val s = norm_text(c)
    when(length(s) >= n,
      array_distinct(transform(sequence(lit(1), length(s) - (n - 1)),
        i => substring(s, i, lit(n)))))
      .otherwise(array(s))
  }

  // ------------------------------------------------------- vector similarity

  /** Elementwise cast to double — do this BEFORE any arithmetic so float
    * rounding never enters the accumulation. */
  def vec_double(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential-fold dot product (index order, double accumulation) over
    * `array<double>` inputs. Bit-reproducible across engines that fold the
    * same way; codegen'd via [[SeqDot]] (requires [[registerAll]], which
    * every GraftSession/SparkEntry path applies). */
  def dotd(a: Column, b: Column): Column = call_function("seq_dot", a, b)

  /** All `tables` sign-LSH bucket ids for a vector in one codegen'd pass
    * (see [[LshBuckets]]); `thresholds` has tables*planes entries. */
  def lsh_buckets(vec: Column, tables: Int, planes: Int, dim: Int,
      thresholds: Seq[Double]): Column =
    call_function("lsh_buckets", vec, lit(tables), lit(planes), lit(dim),
      typedLit(thresholds))

  /** BPE tokenization with a learned merge table (see [[BpeEncode]]):
    * whitespace words → char symbols + `</w>` → merges in rank order. */
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_encode", text, typedLit(merges))

  /** Fertility numerator/denominator struct (n_words, n_tokens) under the
    * markerless merge-chain apply (see [[BpeChainStats]]); pass a
    * pre-lowered text column. */
  def bpe_chain_stats(text: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_chain_stats", text, typedLit(merges))

  /** Per-doc token array under the markerless merge-chain apply (see
    * [[BpeChainEncode]]); pass a pre-lowered text column. */
  def bpe_chain_encode(text: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_chain_encode", text, typedLit(merges))

  /** Unigram-surprisal scoring struct (n_tokens, n_oov, surprisal_sum) —
    * see [[LmSurprisal]]; train the vocab with
    * [[graft.operators.Pipeline.lmSurprisalScores]]. */
  def lm_surprisal(text: Column, vocab: Seq[(String, Long)], nv: Long): Column =
    call_function("lm_surprisal", text, typedLit(vocab), lit(nv))

  /** The `take` nearest IVF anchors for a vector in one codegen'd pass
    * (see [[IvfNearestLists]]); `codebook` is the flattened anchor matrix. */
  def ivf_nearest(vec: Column, codebook: Seq[Double], nlist: Int, dim: Int,
      take: Int): Column =
    call_function("ivf_nearest", vec, typedLit(codebook), lit(nlist), lit(dim),
      lit(take))

  /** PQ encode: normalized vector + its IVF bucket → `m` byte codes (see
    * [[PqEncode]]); `coarse`/`pq` are the flattened codebook matrices. */
  def pq_encode(vec: Column, bucket: Column, coarse: Seq[Double],
      pq: Seq[Double], nlist: Int, dim: Int, m: Int, ksub: Int): Column =
    call_function("pq_encode", vec, bucket, typedLit(coarse), typedLit(pq),
      lit(nlist), lit(dim), lit(m), lit(ksub))

  /** ADC score: per-query lookup table × PQ codes (see [[PqAdc]]). */
  def pq_adc(tab: Column, codes: Column, m: Int, ksub: Int): Column =
    call_function("pq_adc", tab, codes, lit(m), lit(ksub))

  /** Interpreted HOF formulation of [[dotd]] — kept as the executable
    * specification SeqDot is tested against. */
  def dotd_hof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity = dot/(sqrt(na)*sqrt(nb)) over double-cast inputs. */
  def cosine(a: Column, b: Column): Column = {
    val ad = vec_double(a)
    val bd = vec_double(b)
    dotd(ad, bd) / (sqrt(dotd(ad, ad)) * sqrt(dotd(bd, bd)))
  }

  /** L2 norm. */
  def l2_norm(a: Column): Column = sqrt(dotd(vec_double(a), vec_double(a)))

  /** Row-local k-value minhash signature over an array<long> of shingle
    * hashes (no explode/aggregate — see [[MinHashSignature]]). */
  def minhash_sig(hashes: Column, k: Int): Column =
    call_function("minhash_sig", hashes, lit(k))

  /** Row-local 64-bit simhash over an array<long> of shingle hashes. */
  def simhash_sig(hashes: Column): Column = call_function("simhash_sig", hashes)

  /** Per-element xxhash64 of a string array (shingles → shingle hashes). */
  def hash_array(c: Column): Column = transform(c, x => xxhash64(x))

  /** Fused fast path for `hash_array(shingles(c, n))`: sorted distinct
    * shingle hashes in one byte-level codegen'd pass (identical values —
    * see [[TextScan.wordShingleHashes]]). The sorted order is the canonical
    * global order prefix-filtered similarity joins rely on. */
  def shingle_hashes(c: Column, n: Int): Column =
    call_function("shingle_hashes", c, lit(n))

  /** Sorted distinct xxhash64 values of the character n-grams of an
    * ALREADY-normalized string (apply [[norm_text]] upstream — once per
    * row, codegen'd); value-identical to hashing [[char_shingles]]'s
    * output, one byte-level pass (see [[TextScan.charNgramHashes]]). */
  def char_ngram_hashes(normText: Column, n: Int): Column =
    call_function("char_ngram_hashes", normText, lit(n))

  /** Byte-scan fast path for [[lang_guess]] (identical values). */
  def lang_guess_fast(c: Column): Column =
    call_function("lang_guess_scan", lower(c))

  /** 12-bit md5-prefix buckets of the word unigram+bigram feature stream —
    * fused fast path for `conv(substring(md5(f), 1, 3), 16, 10)` over the
    * exploded unigrams ++ adjacent-bigrams of `split(trim(c), ws+)`
    * (identical bucket multiset; see [[TextScan.hashedNgramBuckets]]). */
  def hashed_ngram_buckets(c: Column): Column =
    call_function("hashed_ngram_buckets", c)

  /** Fused fast path for [[shingles]] (identical distinct shingle strings). */
  def shingle_strings(c: Column, n: Int): Column =
    call_function("shingle_strings", c, lit(n))

  /** Merge-pass |a ∩ b| over sorted distinct long arrays (the
    * [[shingle_hashes]] representation) — allocation-free replacement for
    * `size(array_intersect(a, b))`. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    call_function("sorted_intersect_count", a, b)

  /** Codegen'd bloom membership probe over a driver-built serialized
    * [[org.apache.spark.util.sketch.BloomFilter]] (see [[BloomMightContain]]). */
  def bloom_might_contain(bloomBytes: Array[Byte], hash: Column): Column =
    call_function("bloom_might_contain", lit(bloomBytes), hash)

  /** Codegen'd count-min point estimate over a driver-built serialized
    * [[org.apache.spark.util.sketch.CountMinSketch]] (see [[CmsEstimate]]);
    * never under-counts, so `>= T` comparisons are sound prefilters. */
  def cms_estimate(cmsBytes: Array[Byte], item: Column): Column =
    call_function("cms_estimate", lit(cmsBytes), item)
}
