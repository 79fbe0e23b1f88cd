package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Product-quantization encode: one vector → `m` byte codes, one codegen'd
  * pass (the IVF-PQ index build kernel — Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * The input is the L2-NORMALIZED vector (so downstream ADC scores
  * approximate cosine directly); the kernel subtracts the vector's coarse
  * anchor (`bucket`, from the IVF assignment) and, per subspace `s`, picks
  * the codeword minimizing squared L2 distance over that subspace's
  * `dsub = dim/m` dims — ties to the lower codeword id, so encoding is
  * fully deterministic and rebuilds are byte-identical.
  *
  * `coarse` is the flattened [j*dim + i] anchor matrix (the IVF codebook);
  * `pq` is the flattened [((s*ksub)+j)*dsub + d] codeword matrix. Both ride
  * as reference objects — flops per row, not plan size.
  */
case class PqEncode(
    left: Expression,
    right: Expression,
    coarse: Seq[Double],
    pq: Seq[Double],
    nlist: Int,
    dim: Int,
    m: Int,
    ksub: Int) extends BinaryExpression {

  require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
  require(ksub >= 1 && ksub <= 256, s"ksub ($ksub) must fit one byte, got $ksub")
  require(coarse.length == nlist * dim,
    s"coarse codebook must have nlist*dim = ${nlist * dim} entries (got ${coarse.length})")
  require(pq.length == m * ksub * (dim / m),
    s"pq codebook must have m*ksub*dsub = ${m * ksub * (dim / m)} entries (got ${pq.length})")

  override def dataType: DataType = BinaryType

  @transient private lazy val coarseMat: Array[Double] = coarse.toArray
  @transient private lazy val pqMat: Array[Double] = pq.toArray

  override def nullSafeEval(v: Any, b: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], b.asInstanceOf[Int],
      coarseMat, pqMat, dim, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cm = ctx.addReferenceObj("pqCoarse", coarseMat, "double[]")
    val pm = ctx.addReferenceObj("pqCodebook", pqMat, "double[]")
    nullSafeCodeGen(ctx, ev, (v, b) =>
      s"${ev.value} = graft.functions.PqEncode.compute(" +
        s"$v, $b, $cm, $pm, $dim, $m, $ksub);")
  }

  override def prettyName: String = "pq_encode"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  /** Shared eval/codegen kernel: residual vs the bucket's anchor, per-
    * subspace argmin L2 with ties to the lower codeword id. */
  def compute(v: ArrayData, bucket: Int, coarse: Array[Double],
      pq: Array[Double], dim: Int, m: Int, ksub: Int): Array[Byte] = {
    val dsub = dim / m
    val cBase = bucket * dim
    val r = new Array[Double](dim)
    val n = math.min(dim, v.numElements())
    var i = 0
    while (i < n) { r(i) = v.getDouble(i) - coarse(cBase + i); i += 1 }
    while (i < dim) { r(i) = -coarse(cBase + i); i += 1 }
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val rBase = s * dsub
      var bj = 0
      var bd = Double.MaxValue
      var j = 0
      while (j < ksub) {
        val pBase = (s * ksub + j) * dsub
        var d2 = 0.0
        var d = 0
        while (d < dsub) {
          val diff = r(rBase + d) - pq(pBase + d)
          d2 += diff * diff
          d += 1
        }
        // strict < keeps the first (lowest-id) codeword on exact ties —
        // and rejects NaN distances, so a NaN vector degrades to code 0
        if (d2 < bd) { bd = d2; bj = j }
        j += 1
      }
      out(s) = bj.toByte
      s += 1
    }
    out
  }
}

/** Asymmetric-distance (ADC) scan kernel: score one PQ-coded vector
  * against a query's precomputed lookup table in `m` adds — the IVF-PQ
  * probe's inner loop. `tab[s*ksub + j] = q̂_sub(s) · codeword(s,j)`, built
  * driver-side per query (m·ksub doubles — broadcast-sized); the full
  * approximate cosine is `q̂·anchor(bucket) + pq_adc(tab, codes)`, with the
  * first term a per-(query, bucket) column. No decode, no per-row float
  * vector — the scan reads `m` bytes per corpus vector. */
case class PqAdc(
    left: Expression,
    right: Expression,
    m: Int,
    ksub: Int) extends BinaryExpression {

  require(ksub >= 1 && ksub <= 256, s"ksub ($ksub) must fit one byte, got $ksub")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(tab: Any, codes: Any): Any =
    PqAdc.compute(tab.asInstanceOf[ArrayData], codes.asInstanceOf[Array[Byte]],
      m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tab, codes) =>
      s"${ev.value} = graft.functions.PqAdc.compute($tab, $codes, $m, $ksub);")

  override def prettyName: String = "pq_adc"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  /** Index-order fold (deterministic double sum, the SeqDot discipline). */
  def compute(tab: ArrayData, codes: Array[Byte], m: Int, ksub: Int): Double = {
    val n = math.min(m, codes.length)
    var s = 0
    var acc = 0.0
    while (s < n) {
      acc += tab.getDouble(s * ksub + (codes(s) & 0xFF))
      s += 1
    }
    acc
  }
}
