package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Row-local sketch signatures over pre-hashed shingle arrays.
  *
  * The naive minhash plan explodes shingles and runs k min-aggregates —
  * a full shuffle of |docs|·|shingles| rows. These expressions compute the
  * whole signature in one pass over the row's shingle-hash array: no
  * explode, no aggregate, no shuffle. At 100 TB the signature stage becomes
  * embarrassingly parallel map work; only band buckets ever shuffle.
  *
  * Per-function hashes derive from the base shingle hash via splitmix64
  * finalization of (h ^ seed_i) — a distinct universal-ish permutation per
  * i without rehashing the shingle bytes k times.
  */
object Sketches {
  private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** k minhash values over the hash array (Long.MaxValue for empty input). */
  def minhash(hs: ArrayData, k: Int): ArrayData = {
    val out = Array.fill(k)(Long.MaxValue)
    val n = hs.numElements()
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < k) {
        val v = splitmix(h ^ (i.toLong * 0xA24BAED4963EE407L))
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit simhash: per-bit majority vote over the hash array. */
  def simhash(hs: ArrayData): Long = {
    val sums = new Array[Int](64)
    val n = hs.numElements()
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Sketches.minhash(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.minhash($c, $k)")
  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `cms_estimate(cmsBytes, item)`: point estimate from a driver-built
  * serialized [[org.apache.spark.util.sketch.CountMinSketch]], probed inside
  * whole-stage codegen. CMS never under-counts, so `cms_estimate(x) >= T`
  * is a sound prefilter for exact heavy-hitter verification: rows it
  * rejects are definitely below T. */
case class CmsEstimate(cmsBytes: Expression, child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = cmsBytes
  override def right: Expression = child
  override def dataType: DataType = LongType
  require(cmsBytes.foldable, "count-min sketch bytes must be a literal")

  @transient private lazy val cms: org.apache.spark.util.sketch.CountMinSketch =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(cmsBytes.eval(null).asInstanceOf[Array[Byte]]))

  override protected def nullSafeEval(b: Any, v: Any): Any =
    cms.estimateCount(v.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmSketch", cms,
      classOf[org.apache.spark.util.sketch.CountMinSketch].getName)
    defineCodeGen(ctx, ev, (_, v) => s"$ref.estimateCount($v.toString())")
  }
  override def prettyName: String = "cms_estimate"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(cmsBytes = newLeft, child = newRight)
}

case class SimHashSignature(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Sketches.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.simhash($c)")
  override def prettyName: String = "simhash_sig"
  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}
