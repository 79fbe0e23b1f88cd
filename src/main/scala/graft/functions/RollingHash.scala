package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash (Rabin–Karp style) over a string's UTF-8
  * bytes: h = h * 1099511628211 + byte (FNV-prime multiplier, wrapping).
  *
  * The rolling form is what a streaming document fingerprinter computes
  * incrementally as bytes arrive — extendable without re-reading the prefix
  * (unlike a block hash such as xxhash64). Codegen'd single loop.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingHash64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash64.hash($c.getBytes())")

  override def prettyName: String = "rolling_hash64"
  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  final val Prime = 1099511628211L

  def hash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L // FNV offset basis as the seed
    var i = 0
    while (i < bytes.length) {
      h = h * Prime + (bytes(i) & 0xFF)
      i += 1
    }
    h
  }

  /** Extend a running hash with one more byte — the "rolling" step. */
  def roll(h: Long, nextByte: Byte): Long = h * Prime + (nextByte & 0xFF)
}
