package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `tables` sign-LSH bucket ids for one vector, one codegen'd pass.
  *
  * Bit p of table t's bucket is `sign(v · h_{t·planes+p} − threshold)`;
  * the hyperplane matrix is the deterministic splitmix64 family (see
  * [[LshBuckets.planeComponent]] — the same values
  * `graft.operators.Similarity` uses driver-side for query probes, so the
  * two sides agree bit-for-bit). One expression computing every table
  * replaces tables×planes separate SeqDot projections: the per-dot
  * Catalyst/codegen overhead dominated past ~500 planes (64 tables × 12
  * planes OOM'd codegen as discrete expressions), while this loop is
  * tables·planes·dim fused multiply-adds with zero per-dot dispatch.
  *
  * Null vector → null; elements assumed non-null (embedding vectors).
  */
case class LshBuckets(
    child: Expression,
    tables: Int,
    planes: Int,
    dim: Int,
    thresholds: Seq[Double]) extends UnaryExpression {

  require(thresholds.length == tables * planes,
    s"thresholds must have tables*planes = ${tables * planes} entries")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val mat: Array[Double] =
    LshBuckets.planeMatrix(tables * planes, dim)
  @transient private lazy val th: Array[Double] = thresholds.toArray

  override def nullSafeEval(v: Any): Any =
    LshBuckets.compute(v.asInstanceOf[ArrayData], mat, th, tables, planes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("lshPlaneMatrix", mat, "double[]")
    val t = ctx.addReferenceObj("lshThresholds", th, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LshBuckets.compute(" +
        s"$v, $m, $t, $tables, $planes, $dim);")
  }

  override def prettyName: String = "lsh_buckets"
  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {

  /** Deterministic pseudo-random hyperplane component for global plane p:
    * a splitmix64-style avalanche of (p, dimension index), mapped to
    * [-1, 1) — reproducible with no RNG state. */
  def planeComponent(p: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      var z = (p.toLong * 0x9E3779B97F4A7C15L) + (d.toLong * 0xBF58476D1CE4E5B9L) + 0x94D049BB133111EBL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      out(d) = (z >> 11).toDouble / (1L << 52).toDouble
      d += 1
    }
    out
  }

  /** Flattened [plane * dim + d] matrix of the first nPlanes hyperplanes. */
  def planeMatrix(nPlanes: Int, dim: Int): Array[Double] = {
    val m = new Array[Double](nPlanes * dim)
    var p = 0
    while (p < nPlanes) {
      System.arraycopy(planeComponent(p, dim), 0, m, p * dim, dim)
      p += 1
    }
    m
  }

  /** Shared eval/codegen kernel: per table, pack the planes' threshold
    * signs into a long; dots fold sequentially in index order (the SeqDot
    * contract, bit-identical to the driver-side query path). */
  def compute(v: ArrayData, m: Array[Double], th: Array[Double],
      tables: Int, planes: Int, dim: Int): ArrayData = {
    val out = new Array[Long](tables)
    val n = math.min(dim, v.numElements())
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val g = t * planes + p
        val base = g * dim
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * m(base + i); i += 1 }
        if (s >= th(g)) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
