package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** HyperLogLog cardinality aggregate over pre-hashed 64-bit inputs.
  *
  * Re-expresses the reference's probabilistic aggregation
  * (`probabilistic/src/main/java/com/hazelcast/jet/contrib/probabilistic/
  * ProbabilisticAggregations.java:28-70`): explicit precision in [4,16]
  * (default 14), `Long` hash input, `Long` estimate output, and a
  * create/accumulate/combine/finish shape — which maps 1:1 onto Spark's
  * `TypedImperativeAggregate` (SURVEY.md §1.3). The buffer is the raw
  * register array, so partial aggregation, shuffle-side merge, and
  * sketch serialization are all a single `Array[Byte]`.
  *
  * Estimator: standard HLL (Flajolet et al.) with linear counting for the
  * small range. Standard error 1.04/sqrt(2^p) — at the reference's default
  * p=14 that is 0.81%, well inside its ±5% acceptance band
  * (`HyperLogLogTest.java:72-74`).
  */
case class HyperLogLogPP(
    child: Expression,
    precision: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(
    precision >= HyperLogLogPP.MinPrecision && precision <= HyperLogLogPP.MaxPrecision,
    s"hyper_log_log precision must be in [${HyperLogLogPP.MinPrecision}, " +
      s"${HyperLogLogPP.MaxPrecision}], got $precision")

  private val m: Int = 1 << precision

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val hash = v.asInstanceOf[Long]
      val idx = (hash >>> (64 - precision)).toInt
      val w = hash << precision
      // low `precision` bits of w are zero, so nlz(w) <= 63 - precision
      val rank = if (w == 0L) (64 - precision + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = HyperLogLogPP.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hyper_log_log"

  override def withNewMutableAggBufferOffset(newOffset: Int): HyperLogLogPP =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HyperLogLogPP =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HyperLogLogPP =
    copy(child = newChild)
}

object HyperLogLogPP {
  // Bounds mirror ProbabilisticAggregations.java:28-30 (MIN/MAX/DEFAULT precision).
  val MinPrecision = 4
  val MaxPrecision = 16
  val DefaultPrecision = 14

  private[functions] val InvPow2: Array[Double] =
    Array.tabulate(64)(r => java.lang.Math.pow(2.0, -r))

  /** HLL estimator over a register array (m = regs.length = 2^precision). */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += InvPow2(regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) e = m * math.log(m.toDouble / zeros)
    math.round(e)
  }

  /** FunctionRegistry builder: hyper_log_log(col[, precision]). The input is
    * cast to LongType (a long→long cast is elided by SimplifyCasts). */
  def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(c) => HyperLogLogPP(Cast(c, LongType), DefaultPrecision)
    case Seq(c, Literal(p: Int, IntegerType)) => HyperLogLogPP(Cast(c, LongType), p)
    case _ =>
      throw new IllegalArgumentException(
        "hyper_log_log expects (col) or (col, <int literal precision>)")
  }
}
