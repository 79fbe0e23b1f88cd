package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Sequential-fold dot product over two `array<double>` columns.
  *
  * Bit-identical to the HOF formulation
  * `aggregate(zip_with(a,b,(x,y)->x*y), 0.0, (acc,x)->acc+x)` — a strict
  * left-to-right `acc += a(i)*b(i)` in index order, which is also what
  * DuckDB's `list_dot_product`/`list_cosine_similarity` compute over
  * `DOUBLE[]` — but a single codegen'd loop instead of an interpreted
  * higher-order-function chain (no per-element lambda dispatch, no
  * intermediate array).
  *
  * Nulls: null array → null; elements are assumed non-null (embedding
  * vectors), matching the HOF version's behavior on our data.
  */
case class SeqDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override def prettyName: String = "seq_dot"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SeqDot =
    copy(left = newLeft, right = newRight)
}
