package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Byte-pair-encoding tokenization (Sennrich et al. 2016, the tokenizer
  * the prompt's "BPE-ish" counter approximates).
  *
  * [[BpeTrainer.trainMerges]] learns the merge table THE 100 TB WAY: one
  * corpus pass aggregates (word, freq) — the word vocabulary is orders of
  * magnitude smaller than the corpus — and the classic greedy merge loop
  * runs driver-side over that weighted vocab (exactly how production
  * tokenizer trainers work: corpus-scale word counting, memory-scale
  * merging). Deterministic: pair ties break lexicographically, vocab is
  * bounded by (freq desc, word asc).
  *
  * [[BpeEncode]] applies a learned merge table to a text column as ONE
  * codegen'd expression: whitespace words → character symbols + the </w>
  * end-of-word marker → merges applied in rank order. Row-local, no
  * shuffle; encoding is LOSSLESS by construction (concatenating a word's
  * tokens and dropping the marker reproduces the word — the oracle
  * invariant q97 pins).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table: Array[(String, String)] = merges.toArray

  override def nullSafeEval(v: Any): Any =
    BpeEncode.encode(v.asInstanceOf[UTF8String].toString, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw-type cast: Janino rejects generic ARRAY casts ("')' expected
    // instead of '['"), silently dropping the expression to interpreter
    val m = ctx.addReferenceObj("bpeMerges", table, "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BpeEncode.encode($v.toString(), " +
        s"(scala.Tuple2[]) $m);")
  }

  override def prettyName: String = "bpe_encode"
  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  val Marker = "</w>"

  /** Split a word into symbols and apply merges in rank order (the
    * standard greedy BPE application). Rules that can't fire are detected
    * with a scan-only pass — no allocation for the (vast) majority of
    * (word, rule) combinations that don't match. */
  def encodeWord(word: String, merges: Array[(String, String)]): Array[String] = {
    var syms: Array[String] =
      word.map(_.toString).toArray :+ Marker
    var r = 0
    while (r < merges.length && syms.length > 1) {
      val (a, b) = merges(r)
      var hit = -1
      var i = 0
      while (hit < 0 && i + 1 < syms.length) {
        if (syms(i) == a && syms(i + 1) == b) hit = i
        i += 1
      }
      if (hit >= 0) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out += (a + b)
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.toArray
      }
      r += 1
    }
    syms
  }

  /** Per-thread word→tokens memo: word frequencies are Zipfian, so most
    * word INSTANCES are cache hits and the merge loop runs once per
    * distinct word per task thread. Keyed by the merge-table identity
    * (one table per query); bounded, cleared on overflow or table swap. */
  private val cache = new ThreadLocal[
      (Array[(String, String)], java.util.HashMap[String, Array[String]])]() {
    override def initialValue() = (null, new java.util.HashMap[String, Array[String]]())
  }
  private val MaxCachedWords = 65536

  private def encodeWordCached(word: String, merges: Array[(String, String)]): Array[String] = {
    var (tbl, m) = cache.get()
    if (tbl ne merges) {
      m = new java.util.HashMap[String, Array[String]]()
      cache.set((merges, m))
    }
    val hitVal = m.get(word)
    if (hitVal != null) hitVal
    else {
      val toks = encodeWord(word, merges)
      if (m.size() >= MaxCachedWords) m.clear()
      m.put(word, toks)
      toks
    }
  }

  def encode(text: String, merges: Array[(String, String)]): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    text.split("[ \\t\\n\\f\\r]+").foreach { w =>
      if (w.nonEmpty)
        encodeWordCached(w, merges).foreach(s => out += UTF8String.fromString(s))
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** Markerless merge-chain apply over a whole (pre-lowered) text — the
  * row-local encode step for the [[graft.operators.Pipeline]] BPE family
  * (no `</w>` marker; words split on `[^a-z0-9]+` exactly like its
  * trainer). Returns struct(n_words, n_tokens): the fertility
  * numerator/denominator in ONE codegen'd corpus pass, no explode, no
  * vocab join — the held-out apply works for words the training never
  * saw, because each merge rule replays its exact
  * leftmost-non-overlapping pass (rank order; identical to the training
  * fold on in-vocab words — a pair's adjacencies are fully consumed when
  * it wins and can never be re-created by later merges, so one pass per
  * rule in learn order reproduces the trainer's rewrite sequence). */
case class BpeChainStats(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_words",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType, nullable = false)))

  @transient private lazy val table: Array[(String, String)] = merges.toArray

  override def nullSafeEval(v: Any): Any =
    BpeChain.stats(v.asInstanceOf[UTF8String].toString, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeChainMerges", table, "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BpeChain.stats($v.toString(), " +
        s"(scala.Tuple2[]) $m);")
  }

  override def prettyName: String = "bpe_chain_stats"
  override protected def withNewChildInternal(newChild: Expression): BpeChainStats =
    copy(child = newChild)
}

/** The per-doc token array under the same markerless chain semantics —
  * the exposed encode step ([[graft.operators.Pipeline.bpeEncode]]). */
case class BpeChainEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table: Array[(String, String)] = merges.toArray

  override def nullSafeEval(v: Any): Any =
    BpeChain.encode(v.asInstanceOf[UTF8String].toString, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeChainMerges", table, "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BpeChain.encode($v.toString(), " +
        s"(scala.Tuple2[]) $m);")
  }

  override def prettyName: String = "bpe_chain_encode"
  override protected def withNewChildInternal(newChild: Expression): BpeChainEncode =
    copy(child = newChild)
}

object BpeChain {

  /** Exact leftmost-non-overlapping merge chain on one word, NO
    * end-of-word marker (the [[graft.operators.Pipeline]] trainer
    * family). Scan-only rule detection like [[BpeEncode.encodeWord]]. */
  def encodeWordChain(word: String, merges: Array[(String, String)]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var r = 0
    while (r < merges.length && syms.length > 1) {
      val (a, b) = merges(r)
      var hit = -1
      var i = 0
      while (hit < 0 && i + 1 < syms.length) {
        if (syms(i) == a && syms(i + 1) == b) hit = i
        i += 1
      }
      if (hit >= 0) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out += (a + b)
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.toArray
      }
      r += 1
    }
    syms
  }

  /** Per-thread word→tokens memo (Zipfian hit rate), keyed by merge-table
    * identity — the [[BpeEncode]] cache device for the chain family. */
  private val cache = new ThreadLocal[
      (Array[(String, String)], java.util.HashMap[String, Array[String]])]() {
    override def initialValue() = (null, new java.util.HashMap[String, Array[String]]())
  }
  private val MaxCachedWords = 65536

  private def cached(word: String, merges: Array[(String, String)]): Array[String] = {
    var (tbl, m) = cache.get()
    if (tbl ne merges) {
      m = new java.util.HashMap[String, Array[String]]()
      cache.set((merges, m))
    }
    val hit = m.get(word)
    if (hit != null) hit
    else {
      val toks = encodeWordChain(word, merges)
      if (m.size() >= MaxCachedWords) m.clear()
      m.put(word, toks)
      toks
    }
  }

  private val SplitRe = java.util.regex.Pattern.compile("[^a-z0-9]+")

  def stats(text: String, merges: Array[(String, String)]): org.apache.spark.sql.catalyst.InternalRow = {
    var nWords = 0L
    var nTokens = 0L
    SplitRe.split(text).foreach { w =>
      if (w.nonEmpty) {
        nWords += 1L
        nTokens += cached(w, merges).length.toLong
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(nWords, nTokens)
  }

  def encode(text: String, merges: Array[(String, String)]): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    SplitRe.split(text).foreach { w =>
      if (w.nonEmpty)
        cached(w, merges).foreach(s => out += UTF8String.fromString(s))
    }
    new GenericArrayData(out.toArray[Any])
  }
}

object BpeTrainer {

  /** The driver-side merge loop over a weighted word vocabulary:
    * `words` is (word, freq); returns `nMerges` merges in learn order.
    * Argmax pair by (total freq desc, pair asc) — fully deterministic. */
  def mergesFromVocab(words: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    // each vocab word as its current symbol sequence + weight
    var vocab: Array[(Array[String], Long)] = words.map { case (w, f) =>
      (w.map(_.toString).toArray :+ BpeEncode.Marker, f)
    }.toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var it = 0
    while (it < nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- vocab) {
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) return out.toSeq
      val best = counts.toSeq.minBy { case ((a, b), f) => (-f, a, b) }._1
      out += best
      val (a, b) = best
      vocab = vocab.map { case (syms, f) =>
        if (syms.length < 2) (syms, f)
        else {
          val merged = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += (a + b)
              i += 2
            } else {
              merged += syms(i)
              i += 1
            }
          }
          (merged.toArray, f)
        }
      }
      it += 1
    }
    out.toSeq
  }
}
