package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** KMV (k-minimum-values) sketch — the set-similarity member of the sketch
  * family (HLL: cardinality, Bloom: membership, CMS: frequency, KMV:
  * cardinality AND intersection/Jaccard between groups).
  *
  * The sketch is the k smallest 64-bit hash values of a set, kept sorted.
  * Two KMV sketches combine by merging and re-truncating to k — the same
  * persist-then-roll-up contract as `hll_sketch`/`hll_merge`
  * (mergeability across jobs, days, partitions). The payoff at 100 TB: a
  * pairwise similarity matrix over G groups costs G fixed-size sketches
  * (one aggregate over the corpus) + G² tiny driver-side comparisons,
  * instead of a token-level inverted-index join per pair.
  *
  * Estimates (from "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations", Beyer et al., SIGMOD 2007):
  *  - distinct(A) ≈ (k-1) / frac(k-th smallest of A)
  *  - jaccard(A,B) ≈ |{k smallest of A∪B} ∩ A ∩ B| / k
  * Signed 64-bit order is made uniform on [0,1) via the sign-bit flip
  * (u = v XOR Long.MinValue), the standard unsigned mapping.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= (1 << 20), s"kmv_sketch k must be in [2, 2^20], got $k")
  require(child.dataType == LongType, "kmv_sketch input must be a 64-bit hash (LongType)")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  /** binary: the (≤ k) sorted longs, big-endian. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = serialize(buf)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val set = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) set.add(bb.getLong)
    set
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object Kmv {
  def longsOf(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    val bb = ByteBuffer.wrap(bytes)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }
}

/** `kmv_merge(sketchCol, k)` → merged binary sketch: the cross-job rollup
  * (persist per-partition/day sketches, combine later without rescanning
  * raw data — the same contract as `hll_merge`). */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= (1 << 20), s"kmv_merge k must be in [2, 2^20], got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def addAll(
      buf: java.util.TreeSet[java.lang.Long], xs: Array[Long]): Unit = {
    var i = 0
    while (i < xs.length) {
      val h = xs(i)
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size > k) buf.pollLast() }
      i += 1
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) addAll(buf, Kmv.longsOf(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h: Long = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = serialize(buf)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val set = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) set.add(bb.getLong)
    set
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_merge"
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeAgg =
    copy(child = newChild)
}

/** `kmv_jaccard(sketchA, sketchB, k)` → estimated Jaccard similarity.
  * Runs on post-aggregation sketch rows (G rows for G groups), never in
  * the per-row hot path — interpreted eval is deliberate. */
case class KmvJaccard(left: Expression, right: Expression, k: Int)
  extends Expression with BinaryLike[Expression] with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_jaccard"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val xs = Kmv.longsOf(a.asInstanceOf[Array[Byte]])
    val ys = Kmv.longsOf(b.asInstanceOf[Array[Byte]])
    if (xs.isEmpty && ys.isEmpty) return null
    // merge-pass over the two sorted arrays: take the k smallest of the
    // union, counting those present in both
    var i = 0; var j = 0; var taken = 0; var both = 0
    while (taken < k && (i < xs.length || j < ys.length)) {
      if (j >= ys.length || (i < xs.length && xs(i) < ys(j))) { i += 1 }
      else if (i >= xs.length || ys(j) < xs(i)) { j += 1 }
      else { both += 1; i += 1; j += 1 }
      taken += 1
    }
    if (taken == 0) null else both.toDouble / taken.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvJaccard =
    copy(left = newLeft, right = newRight)
}

/** `kmv_distinct(sketch, k)` → estimated distinct count. Exact when the
  * group held fewer than k distinct hashes (the sketch IS the set). */
case class KmvDistinct(child: Expression, k: Int)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_distinct"

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return null
    val xs = Kmv.longsOf(a.asInstanceOf[Array[Byte]])
    if (xs.isEmpty) 0L
    else if (xs.length < k) xs.length.toLong
    else {
      val kth = xs(k - 1)
      val frac = ((kth ^ Long.MinValue).toDouble + 1.0) / 18446744073709551616.0
      math.round((k - 1).toDouble / frac)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}
