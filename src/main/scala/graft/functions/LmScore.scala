package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `lm_surprisal(text, vocab, nv)`: corpus-trained unigram-surprisal
  * scoring — the statistical-LM quality filter of CCNet/Gopher-style
  * curation pipelines, in an engine-exact integer formulation.
  *
  * Per token w: `s(w) = floor(log2(nv / (c(w) + 1)))` where `c(w)` is the
  * token's corpus frequency (0 for out-of-vocabulary) and
  * `nv = totalTokens + |vocab|` (the add-one-smoothing denominator).
  * Rare/unknown tokens carry high surprisal, common tokens low — a
  * document's mean surprisal separates fluent text from gibberish exactly
  * like a real LM perplexity filter, but every quantity here is an
  * INTEGER: floor-log2 over an integer ratio is bit-identical in any
  * engine, unlike `ln`-based log-probs whose last-ulp rounding differs
  * between libm implementations (oracle-hostile).
  *
  * One byte-level pass per row (tokenization shared with
  * [[TokensScan]]), vocabulary applied as a reference object inside
  * whole-stage codegen — no join, no shuffle, scan-pushable.
  * Output struct: (n_tokens, n_oov, surprisal_sum).
  *
  * Reference analog: the reference exposes per-event mapping services
  * (`core/src/main/java/.../MapUsingServiceP`-style transforms); this is
  * that shape specialized to the LLM-curation scorer the brief asks for.
  */
case class LmSurprisal(child: Expression, vocab: Seq[(String, Long)], nv: Long)
  extends UnaryExpression {
  require(nv >= 1, "nv (total tokens + vocab size) must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_oov", LongType, nullable = false),
    StructField("surprisal_sum", LongType, nullable = false)))

  @transient private lazy val table: Array[(String, Long)] = vocab.toArray

  override def nullSafeEval(v: Any): Any =
    LmSurprisal.score(v.asInstanceOf[UTF8String], table, nv)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw-type cast: Janino rejects generic ARRAY casts ("')' expected
    // instead of '['"), silently dropping the expression to interpreter
    val t = ctx.addReferenceObj("lmVocab", table, "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LmSurprisal.score($v, " +
        s"(scala.Tuple2[]) $t, ${nv}L);")
  }

  override def prettyName: String = "lm_surprisal"
  override protected def withNewChildInternal(newChild: Expression): LmSurprisal =
    copy(child = newChild)
}

object LmSurprisal {

  /** Per-thread vocab hash table keyed by the vocab array's identity (one
    * array per query; same memo discipline as [[BpeEncode]]): the
    * UTF8String-keyed map probes tokens without materializing Strings. */
  private val cache = new ThreadLocal[
      (Array[(String, Long)], java.util.HashMap[UTF8String, java.lang.Long])]() {
    override def initialValue() = (null, new java.util.HashMap[UTF8String, java.lang.Long]())
  }

  private def mapFor(vocab: Array[(String, Long)]): java.util.HashMap[UTF8String, java.lang.Long] = {
    var (tbl, m) = cache.get()
    if (tbl ne vocab) {
      m = new java.util.HashMap[UTF8String, java.lang.Long](vocab.length * 2)
      vocab.foreach { case (w, c) => m.put(UTF8String.fromString(w), c) }
      cache.set((vocab, m))
    }
    m
  }

  def score(text: UTF8String, vocab: Array[(String, Long)], nv: Long): InternalRow = {
    val m = mapFor(vocab)
    val toks = TextScan.tokenStrings(text)
    val len = toks.numElements()
    var i = 0
    var oov = 0L
    var sum = 0L
    while (i < len) {
      val c = m.get(toks.getUTF8String(i))
      val cnt = if (c == null) { oov += 1; 0L } else c.longValue()
      // floor(log2(nv / (cnt+1))) over the INTEGER quotient — exact
      sum += 63 - java.lang.Long.numberOfLeadingZeros(nv / (cnt + 1))
      i += 1
    }
    new GenericInternalRow(Array[Any](len.toLong, oov, sum))
  }
}
