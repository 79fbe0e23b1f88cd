package graft.sources.connect

import scala.jdk.CollectionConverters._

import org.apache.kafka.connect.data.{Schema => KSchema, Struct}
import org.apache.spark.sql.types._

/** Kafka Connect `Schema` → Spark `StructType` and schema-driven JSON
  * encoding — the converter half of real Connect hosting (the reference
  * hands users raw `SourceRecord`s and leaves conversion to them; a Spark
  * engine owes them a typed DataFrame). Supported: all Connect primitive
  * types, ARRAY, MAP (string keys), STRUCT, nested arbitrarily. */
object ConnectSchemas {

  def toDataType(schema: KSchema): DataType = schema.`type`() match {
    case KSchema.Type.INT8 => ByteType
    case KSchema.Type.INT16 => ShortType
    case KSchema.Type.INT32 => IntegerType
    case KSchema.Type.INT64 => LongType
    case KSchema.Type.FLOAT32 => FloatType
    case KSchema.Type.FLOAT64 => DoubleType
    case KSchema.Type.BOOLEAN => BooleanType
    case KSchema.Type.STRING => StringType
    case KSchema.Type.BYTES => BinaryType
    case KSchema.Type.ARRAY => ArrayType(toDataType(schema.valueSchema()),
      containsNull = schema.valueSchema().isOptional)
    case KSchema.Type.MAP =>
      require(schema.keySchema().`type`() == KSchema.Type.STRING,
        s"only string map keys convert to Spark MapType keys losslessly via " +
          s"JSON, got ${schema.keySchema().`type`()}")
      MapType(StringType, toDataType(schema.valueSchema()),
        valueContainsNull = schema.valueSchema().isOptional)
    case KSchema.Type.STRUCT => toStructType(schema)
  }

  def toStructType(schema: KSchema): StructType = {
    require(schema.`type`() == KSchema.Type.STRUCT,
      s"expected a STRUCT value schema, got ${schema.`type`()}")
    StructType(schema.fields().asScala.toSeq.map { f =>
      StructField(f.name(), toDataType(f.schema()), nullable = f.schema().isOptional)
    })
  }

  /** Schema-driven JSON encoding of a Connect value, matched to how
    * Spark's `from_json` decodes each Spark type (bytes → base64,
    * structs/maps → objects, arrays → lists) so the round trip is
    * type-exact for the whole supported matrix. */
  def toJson(schema: KSchema, value: Any): String = {
    val sb = new java.lang.StringBuilder
    writeJson(sb, schema, value)
    sb.toString
  }

  private def writeJson(sb: java.lang.StringBuilder, schema: KSchema, value: Any): Unit = {
    if (value == null) { sb.append("null"); return }
    schema.`type`() match {
      case KSchema.Type.INT8 | KSchema.Type.INT16 | KSchema.Type.INT32 |
          KSchema.Type.INT64 | KSchema.Type.FLOAT32 | KSchema.Type.FLOAT64 =>
        sb.append(value.toString): Unit
      case KSchema.Type.BOOLEAN => sb.append(value.toString): Unit
      case KSchema.Type.STRING => writeEscaped(sb, value.toString)
      case KSchema.Type.BYTES =>
        writeEscaped(sb,
          java.util.Base64.getEncoder.encodeToString(value.asInstanceOf[Array[Byte]]))
      case KSchema.Type.ARRAY =>
        sb.append('[')
        val it = value.asInstanceOf[java.util.List[_]].iterator()
        var first = true
        while (it.hasNext) {
          if (!first) sb.append(',')
          writeJson(sb, schema.valueSchema(), it.next())
          first = false
        }
        sb.append(']'): Unit
      case KSchema.Type.MAP =>
        sb.append('{')
        val it = value.asInstanceOf[java.util.Map[_, _]].entrySet().iterator()
        var first = true
        while (it.hasNext) {
          val e = it.next()
          if (!first) sb.append(',')
          writeEscaped(sb, String.valueOf(e.getKey))
          sb.append(':')
          writeJson(sb, schema.valueSchema(), e.getValue)
          first = false
        }
        sb.append('}'): Unit
      case KSchema.Type.STRUCT =>
        val st = value.asInstanceOf[Struct]
        sb.append('{')
        var first = true
        st.schema().fields().asScala.foreach { f =>
          if (!first) sb.append(',')
          writeEscaped(sb, f.name())
          sb.append(':')
          writeJson(sb, f.schema(), st.get(f))
          first = false
        }
        sb.append('}'): Unit
    }
  }

  private def writeEscaped(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"'): Unit
  }
}
