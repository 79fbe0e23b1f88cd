package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond dedup/similarity: benchmark
  * decontamination, deterministic sampling, and corpus statistics.
  *
  * Everything here is a declarative plan over content hashes — no RNG
  * state, no driver-side loops — so results are reproducible run-to-run
  * and identical across engines (the DuckDB oracles replay the same md5
  * arithmetic).
  */
object Pipeline {

  /** Remove training rows whose `textCol` content also appears in `test`
    * (eval-set decontamination). The join key is md5 of the raw bytes: a
    * fixed-width key instead of shuffling document bodies, and a LEFT ANTI
    * join so the train side streams through one hash shuffle. At 100 TB
    * the test side is comparatively tiny — Catalyst/AQE broadcasts it and
    * the anti join becomes a map-side bloom-style probe. */
  def decontaminate(train: DataFrame, test: DataFrame, textCol: String): DataFrame =
    train.join(
      test.select(md5(col(textCol)).as("__h")).distinct(),
      md5(train(textCol)) === col("__h"),
      "left_anti")

  /** [[decontaminate]] with a bloom prefilter — the 100 TB shape. A bloom
    * filter over the test-set hashes is built once (distributed partial
    * merge via `stat.bloomFilter`, ~10 bits/key at 1% fpp) and probed
    * inside whole-stage codegen: rows the bloom rejects are DEFINITELY
    * clean and skip the anti-join entirely, so the shuffle carries only
    * the ~fpp false positives plus the true matches instead of the whole
    * train side. The anti-join verification restores exactness — output
    * is row-identical to [[decontaminate]]. At 100 TB, persist the bloom
    * next to the eval set and reuse it across pipeline runs. */
  def decontaminateBloom(
      train: DataFrame,
      test: DataFrame,
      textCol: String,
      fpp: Double = 0.01): DataFrame = {
    val keys = test.select(xxhash64(col(textCol)).as("h"))
    val expected = math.max(1L, keys.count())
    val bloom = keys.stat.bloomFilter("h", expected, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val might =
      graft.functions.bloom_might_contain(bytes, xxhash64(train(textCol)))
    val safe = train.filter(!might)
    val candidates = train.filter(might)
    safe.unionByName(decontaminate(candidates, test, textCol))
  }

  /** Deterministic content-hash sampling: keep rows whose md5 hex prefix
    * sorts below `hexThreshold` (two hex chars ⇒ rate = parseInt(t,16)/256).
    * Unlike `df.sample`, membership is a pure function of the content —
    * stable across runs, partitionings, and cluster sizes, and the same
    * document is kept or dropped in every derived dataset. */
  def hashSampled(df: DataFrame, textCol: String, hexThreshold: String): Column =
    substring(md5(col(textCol)), 1, hexThreshold.length) < hexThreshold

  /** Per-stratum deterministic sampling: each stratum keeps rows whose md5
    * hex prefix sorts below that stratum's threshold (two hex chars ⇒
    * rate = parseInt(t,16)/256). The rate map rides into the plan as a
    * literal map lookup — no join, no RNG, content-stable membership. */
  def stratifiedHashSampled(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      rates: Map[String, String],
      defaultThreshold: String): Column = {
    val thr = coalesce(
      element_at(typedLit(rates), col(strataCol)), lit(defaultThreshold))
    substring(md5(col(textCol)), 1, 2) < thr
  }

  /** Split each document into overlapping token windows (`chunkSize`
    * tokens, `overlap` shared with the previous chunk) — the
    * tokenize-and-chunk step of a training-data pipeline. Chunk count and
    * boundaries are pure functions of the token count, and the emitted
    * `chunk_text` is the tokens re-joined with single spaces, so results
    * replay identically anywhere. Row-local (posexplode over a computed
    * range): no shuffle at all — at 100 TB this is pure map work. */
  def chunkTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val toks = graft.functions.tokens(col(textCol))
    val n = size(toks)
    // chunks = 1 + ceil((n - chunkSize) / step) for n > chunkSize else 1
    val nChunks = when(n <= chunkSize, lit(1L)).otherwise(
      ceil((n - chunkSize).cast("double") / step).cast("long") + 1L)
    df.select(col(idCol), toks.as("__tk"), n.as("__n"), nChunks.as("__nc"))
      .select(col(idCol), col("__tk"), col("__n"),
        posexplode(sequence(lit(0L), col("__nc") - 1L)).as(Seq("__p", "chunk_idx")))
      .select(col(idCol), col("chunk_idx"),
        least(lit(chunkSize),
          col("__n") - col("chunk_idx") * step).cast("int").as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col("__tk"), (col("chunk_idx") * step + 1).cast("int"), lit(chunkSize)))
          .as("chunk_text"))
  }

  /** Top-k terms per group by tf·(N/df): tf = occurrences within the
    * group, df = distinct documents containing the term corpus-wide, N =
    * total documents. The idf ratio is kept as a plain division (no log)
    * so the score is bit-reproducible across engines. Two aggregates and
    * one join, all keyed on the term — shuffle keys are terms, never
    * documents. */
  def tfidfTopTerms(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      textCol: String,
      nDocs: Long,
      k: Int): DataFrame = {
    // tokenize ONCE, pre-aggregate per (token, doc): tf and df both derive
    // from the (tok, doc, grp, count) intermediate, so the text is scanned
    // and exploded a single time
    val perDoc = df.select(col(idCol).as("__id"), col(groupCol).as("grp"),
      explode(graft.functions.tokens_fast(lower(col(textCol)))).as("tok"))
      .groupBy(col("tok"), col("__id"), col("grp"))
      .agg(count(lit(1)).as("c"))
    val tf = perDoc.groupBy(col("grp"), col("tok")).agg(sum(col("c")).as("tf"))
    val dfreq = perDoc.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("tok"))
    tf.join(dfreq, "tok")
      // pinned evaluation order: (tf * N) / df, all double
      .withColumn("score",
        col("tf").cast("double") * lit(nDocs.toDouble) / col("df").cast("double"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("grp"), col("tok"), col("tf"), col("df"), col("score"), col("rnk"))
  }
}
