package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Late-interaction (ColBERT-style) MaxSim runtime. */
object MaxSim {

  /** score(q, d) = Σ_i max_j dot(q_i, d_j) over consecutive `subDim`-wide
    * sub-vectors — every fold in fixed index order (i outer ascending,
    * j inner ascending, dot left-to-right), so DuckDB replays the exact
    * association with generated slice/dot SQL and hashes match. */
  def score(q: ArrayData, d: ArrayData, subDim: Int): Double = {
    val nq = q.numElements() / subDim
    val nd = d.numElements() / subDim
    var acc = 0.0
    var i = 0
    while (i < nq) {
      var best = Double.NegativeInfinity
      var j = 0
      while (j < nd) {
        var dot = 0.0
        var m = 0
        while (m < subDim) {
          dot += q.getDouble(i * subDim + m) * d.getDouble(j * subDim + m)
          m += 1
        }
        if (dot > best) best = dot
        j += 1
      }
      if (nd > 0) acc += best
      i += 1
    }
    acc
  }
}

/** `maxsim_score(q, d, subDim)`: the late-interaction relevance score —
  * one codegen'd pass per (query, doc) pair, row-local. */
case class MaxSimScore(left: Expression, right: Expression, subDim: Int)
    extends BinaryExpression {
  require(subDim >= 1, "subDim must be positive")
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    MaxSim.score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.MaxSim.score($a, $b, $subDim)")
  override def prettyName: String = "maxsim_score"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxSimScore =
    copy(left = newLeft, right = newRight)
}
