package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** The `take` nearest IVF anchors for one vector, one codegen'd pass.
  *
  * Ranking replays `Similarity.rankedAnchors` exactly: anchors ordered by
  * (-dot, j) ascending — dot descending, ties to the lower index — with
  * each dot a sequential index-order fold (the SeqDot contract, so the
  * expression, the rankedAnchors formulation, and the driver-side probe
  * math in `ivfTopKFromIndex` agree bit-for-bit). One expression replaces
  * `nlist` discrete dot projections + a struct-array sort per row: at
  * nlist=128 that tree was 8× the nlist=16 assignment cost.
  *
  * `codebook` is the flattened [j * dim + i] anchor matrix. Null vector →
  * null; elements assumed non-null (embedding vectors).
  */
case class IvfNearestLists(
    child: Expression,
    codebook: Seq[Double],
    nlist: Int,
    dim: Int,
    take: Int) extends UnaryExpression {

  require(codebook.length == nlist * dim,
    s"codebook must have nlist*dim = ${nlist * dim} entries (got ${codebook.length})")
  require(take >= 1 && take <= nlist, s"take ($take) must be in [1, nlist=$nlist]")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val mat: Array[Double] = codebook.toArray

  override def nullSafeEval(v: Any): Any =
    IvfNearestLists.compute(v.asInstanceOf[ArrayData], mat, nlist, dim, take)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("ivfCodebook", mat, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.IvfNearestLists.compute(" +
        s"$v, $m, $nlist, $dim, $take);")
  }

  override def prettyName: String = "ivf_nearest"
  override protected def withNewChildInternal(newChild: Expression): IvfNearestLists =
    copy(child = newChild)
}

object IvfNearestLists {
  /** Shared eval/codegen kernel: dots folded in index order, anchors
    * ranked by (-dot, j) ascending, first `take` returned. */
  def compute(v: ArrayData, m: Array[Double], nlist: Int, dim: Int, take: Int): ArrayData = {
    val dots = new Array[Double](nlist)
    val n = math.min(dim, v.numElements())
    var j = 0
    while (j < nlist) {
      val base = j * dim
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * m(base + i); i += 1 }
      dots(j) = s
      j += 1
    }
    // partial selection of `take` best by (dot desc, j asc): take is small
    // (nprobe/replicate), so repeated scans beat a full sort
    val out = new Array[Int](take)
    val used = new Array[Boolean](nlist)
    var t = 0
    while (t < take) {
      var bj = -1
      var bd = Double.NegativeInfinity
      var k = 0
      while (k < nlist) {
        if (!used(k) && dots(k) > bd) { bd = dots(k); bj = k }
        k += 1
      }
      // all-NaN dots (NaN input vector) never satisfy `>`: degrade to the
      // first unused list instead of crashing the task on used(-1)
      if (bj < 0) {
        var k2 = 0
        while (k2 < nlist && bj < 0) { if (!used(k2)) bj = k2; k2 += 1 }
      }
      used(bj) = true
      out(t) = bj
      t += 1
    }
    new GenericArrayData(out)
  }
}
