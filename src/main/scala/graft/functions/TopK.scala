package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded top-k as an AGGREGATE, not a window.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY ...) <= k` shuffles and
  * sorts EVERY row of every group; this aggregate keeps a k-element
  * min-heap per group, so the map side pre-combines and the exchange
  * carries at most k rows per (group × input partition) — the difference
  * between shuffling a 100 TB corpus and shuffling `k · groups ·
  * partitions` fixed-size rows for a per-key leaderboard.
  *
  * Ordering is the natural (interpreted) ordering of the input type —
  * for a struct, lexicographic over its fields in declaration order —
  * and the k LARGEST values are kept, emitted descending. Callers encode
  * direction per field (e.g. `struct(cos, -id)` for "cos desc, id asc")
  * and should include a unique tiebreaker field so the order is total
  * and the result deterministic; equal elements survive arbitrarily
  * otherwise (same contract as a window rank over a non-total order).
  *
  * The reference has no aggregation beyond HLL (SURVEY.md §2.3); this is
  * part of the beyond-reference sketch/agg family (HLL, Bloom, CMS,
  * quantile, KMV, top-k), all mergeable for cross-job rollups.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    reverse: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Any]]
  with UnaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20), s"top_k k must be in [1, 2^20], got $k")

  /** reverse=true keeps the k SMALLEST (the `bottom_k` SQL surface) —
    * a direction flip of the comparator, so non-numeric orderings
    * (strings, structs over strings) get both ends without negation
    * tricks. */
  @transient private lazy val ord: Ordering[Any] = {
    val natural = TypeUtils.getInterpretedOrdering(child.dataType)
    if (reverse) natural.reverse else natural
  }

  /** UnsafeRow round-trip makes serialization uniform over any input
    * type (struct, string, numeric) — one field, one projection. */
  @transient private lazy val ser = UnsafeProjection.create(Array(child.dataType))

  override def createAggregationBuffer(): java.util.PriorityQueue[Any] =
    new java.util.PriorityQueue[Any](math.min(k, 1024), ord.asInstanceOf[java.util.Comparator[Any]])

  /** owned=false values may sit in reused evaluation buffers and are
    * deep-copied on admission (InternalRow.copyValue covers rows, arrays,
    * maps, strings); owned=true values (merge of a discarded sibling
    * buffer, freshly deserialized bytes) are taken as-is. */
  private def offer(buf: java.util.PriorityQueue[Any], v: Any, owned: Boolean): Unit =
    if (buf.size < k) buf.add(if (owned) v else InternalRow.copyValue(v))
    else if (ord.compare(v, buf.peek()) > 0) {
      buf.poll(); buf.add(if (owned) v else InternalRow.copyValue(v))
    }

  override def update(
      buf: java.util.PriorityQueue[Any], input: InternalRow): java.util.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v, owned = false)
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[Any],
      other: java.util.PriorityQueue[Any]): java.util.PriorityQueue[Any] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next(), owned = true)
    buf
  }

  /** array of the k largest, DESCENDING (rank order). */
  override def eval(buf: java.util.PriorityQueue[Any]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr, ord.reverse.asInstanceOf[java.util.Comparator[AnyRef]])
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[Any]): Array[Byte] = {
    val rows = buf.toArray.map(v => ser(InternalRow(v)).copy().getBytes)
    val bb = ByteBuffer.allocate(4 + rows.map(_.length + 4).sum)
    bb.putInt(rows.length)
    rows.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Any] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(1)
      row.pointTo(arr, len)
      offer(buf, row.get(0, child.dataType), owned = true)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = if (reverse) "bottom_k" else "top_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
}
