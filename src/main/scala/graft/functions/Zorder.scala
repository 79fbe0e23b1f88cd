package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleaving — the clustering key for
  * multi-column data skipping ([[graft.operators.Bucketing.writeZOrdered]]).
  * Pure integer bit-spreading, codegen'd, row-local. */
object Zorder {

  /** Max bits kept per dimension: 2 × 31 = 62 interleaved bits stays
    * inside a positive long (range partitioning and parquet min/max
    * statistics order signed longs). */
  val BitsPerDim = 31

  /** Spread the low 31 bits of `x` so a zero bit separates each — the
    * standard 2D Morton magic-mask ladder. */
  def spread(x: Long): Long = {
    var v = x & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Interleave two non-negative 31-bit values: bit i of `a` lands at
    * 2i, bit i of `b` at 2i+1. Points close in BOTH dimensions are close
    * on the resulting curve — sorting by it clusters rows so parquet
    * row-group min/max prunes on either column. */
  def interleave2(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** `morton_interleave(a, b)`: Z-order interleave of two longs (low 31
  * bits each) — scale inputs to a bounded non-negative range first. */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Zorder.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Zorder.interleave2($a, $b)")
  override def prettyName: String = "morton_interleave"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)
}
