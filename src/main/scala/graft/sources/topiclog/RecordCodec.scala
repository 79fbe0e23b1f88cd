package graft.sources.topiclog

import java.io.ByteArrayOutputStream

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binary named-record codec — the Pulsar rich-schema analog (the
  * reference's `Schema<M>` supplier is fully pluggable,
  * `pulsar/.../PulsarSources.java:84-92`, including `Schema.AVRO`): a
  * compact Avro-style binary encoding of a named struct plus Avro's
  * WRITER/READER schema-resolution rules, so a consumer can read topics
  * produced under an older or reordered schema.
  *
  * Wire format (avro-analog, not Avro wire-compatible — documented local
  * format): fields in WRITER-schema order, each as a 1-byte present/null
  * marker followed by the value — zigzag varints for INT/BIGINT, IEEE
  * little-endian for FLOAT/DOUBLE, a single byte for BOOLEAN, and
  * varint-length-prefixed bytes for STRING/BINARY.
  *
  * Resolution (Avro semantics): reader fields match writer fields BY NAME —
  * reordering is free, reader-only fields decode as null (the
  * default-value rule), writer-only fields are parsed and skipped.
  *
  * Codec string: `record:<readerDDL>` or
  * `record:<readerDDL>@writer:<writerDDL>` (writer defaults to reader).
  * Parsed specs are memoized — the per-message path never touches DDL. */
object RecordCodec {

  val Prefix = "record:"
  private val WriterSep = "@writer:"

  final case class Spec(reader: StructType, writer: StructType, fieldMap: Array[Int])

  private val cache = TrieMap.empty[String, Spec]

  def isRecord(codec: String): Boolean = codec.startsWith(Prefix)

  def parse(codec: String): Spec = cache.getOrElseUpdate(codec, {
    val body = codec.stripPrefix(Prefix)
    val (r, w) = body.indexOf(WriterSep) match {
      case -1 => (body, body)
      case i => (body.substring(0, i), body.substring(i + WriterSep.length))
    }
    val reader = StructType.fromDDL(r)
    val writer = StructType.fromDDL(w)
    (reader.fields ++ writer.fields).foreach(f => checkType(f.dataType))
    val fieldMap = reader.fields.map { f =>
      val wi = writer.fieldNames.indexOf(f.name)
      require(wi < 0 || writer.fields(wi).dataType == f.dataType,
        s"record codec: field '${f.name}' is ${writer.fields(wi).dataType} in the " +
          s"writer schema but ${f.dataType} in the reader schema")
      wi
    }
    Spec(reader, writer, fieldMap)
  })

  private def checkType(dt: DataType): Unit = dt match {
    case IntegerType | LongType | FloatType | DoubleType | BooleanType |
         StringType | BinaryType => ()
    case other => throw new IllegalArgumentException(
      s"record codec: unsupported field type $other " +
        "(supported: INT, BIGINT, FLOAT, DOUBLE, BOOLEAN, STRING, BINARY)")
  }

  private def writeZigZag(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = (v0 << 1) ^ (v0 >> 63)
    while ((v & ~0x7FL) != 0L) { out.write(((v & 0x7FL) | 0x80L).toInt); v >>>= 7 }
    out.write((v & 0x7FL).toInt)
  }

  private final class Cursor(val buf: Array[Byte]) { var pos = 0 }

  private def readZigZag(c: Cursor): Long = {
    var n = 0L; var shift = 0
    var b = 0
    do {
      b = c.buf(c.pos) & 0xFF; c.pos += 1
      n |= (b & 0x7FL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    (n >>> 1) ^ -(n & 1L)
  }

  private def writeLe(out: ByteArrayOutputStream, bits: Long, bytes: Int): Unit = {
    var i = 0
    while (i < bytes) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  private def readLe(c: Cursor, bytes: Int): Long = {
    var bits = 0L; var i = 0
    while (i < bytes) { bits |= (c.buf(c.pos + i) & 0xFFL) << (8 * i); i += 1 }
    c.pos += bytes
    bits
  }

  /** Encode one record under `schema` (writer side — also what a producer
    * sink uses). `values` are JVM-typed in schema field order. */
  def encode(values: Seq[Any], schema: StructType): Array[Byte] = {
    require(values.length == schema.length,
      s"record encode: ${values.length} values for ${schema.length} fields")
    val out = new ByteArrayOutputStream(32)
    schema.fields.zip(values).foreach { case (f, v) =>
      if (v == null) out.write(0)
      else {
        out.write(1)
        f.dataType match {
          case IntegerType => writeZigZag(out, v.asInstanceOf[Number].longValue())
          case LongType => writeZigZag(out, v.asInstanceOf[Number].longValue())
          case FloatType =>
            writeLe(out, java.lang.Float.floatToIntBits(v.asInstanceOf[Number].floatValue()) & 0xFFFFFFFFL, 4)
          case DoubleType =>
            writeLe(out, java.lang.Double.doubleToLongBits(v.asInstanceOf[Number].doubleValue()), 8)
          case BooleanType => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
          case StringType =>
            val b = v.toString.getBytes("UTF-8")
            writeZigZag(out, b.length.toLong); out.write(b, 0, b.length)
          case BinaryType =>
            val b = v.asInstanceOf[Array[Byte]]
            writeZigZag(out, b.length.toLong); out.write(b, 0, b.length)
          case other => throw new IllegalArgumentException(s"record codec: $other")
        }
      }
    }
    out.toByteArray
  }

  /** Decode one writer-schema field to its CATALYST value. */
  private def readValue(c: Cursor, dt: DataType): Any = dt match {
    case IntegerType => readZigZag(c).toInt
    case LongType => readZigZag(c)
    case FloatType => java.lang.Float.intBitsToFloat(readLe(c, 4).toInt)
    case DoubleType => java.lang.Double.longBitsToDouble(readLe(c, 8))
    case BooleanType => { val b = c.buf(c.pos); c.pos += 1; b != 0 }
    case StringType =>
      val n = readZigZag(c).toInt
      val s = UTF8String.fromBytes(c.buf, c.pos, n); c.pos += n; s
    case BinaryType =>
      val n = readZigZag(c).toInt
      val b = java.util.Arrays.copyOfRange(c.buf, c.pos, c.pos + n); c.pos += n; b
    case other => throw new IllegalArgumentException(s"record codec: $other")
  }

  /** Decode a payload written under `spec.writer` and resolve it to
    * `spec.reader`: an InternalRow in reader field order (name-matched;
    * reader-only fields null, writer-only fields skipped). */
  def decodeToCatalyst(payload: Array[Byte], spec: Spec): InternalRow = {
    val c = new Cursor(payload)
    val writerVals = new Array[Any](spec.writer.length)
    var i = 0
    while (i < spec.writer.length) {
      val present = c.buf(c.pos); c.pos += 1
      writerVals(i) =
        if (present == 0) null else readValue(c, spec.writer.fields(i).dataType)
      i += 1
    }
    new GenericInternalRow(spec.fieldMap.map(w => if (w < 0) null else writerVals(w)))
  }
}
