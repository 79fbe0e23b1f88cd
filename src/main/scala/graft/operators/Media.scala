package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise with iterator-to-iterator
  * `mapPartitions` (no per-row setup; the decoder/service initializes once
  * per partition — the `mapUsingService` shape at scale).
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (byte-histogram "features",
  * length-derived "dimensions"); the Spark-side contract — schema,
  * batching, partitioning, output shape — is the real, tested path. Swap
  * `StubCodec` for a real codec (JNI/FFmpeg/ImageIO) on a cluster.
  */
object Media {

  /** media struct: payload + mime + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("bytes", BinaryType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = false)))

  /** Wrap a binary column into the media struct. */
  def asMedia(bytesCol: String, mime: String): org.apache.spark.sql.Column =
    struct(col(bytesCol).as("bytes"), lit(mime).as("mime"),
      map(lit("origin"), lit("graft")).as("meta"))

  /** STUB CODEC — stands in for image/audio decode in this container.
    * Deterministic pure function of the payload bytes. */
  object StubCodec {
    /** "decode" → (width, height) pretend-dimensions from the byte length. */
    def dimensions(bytes: Array[Byte]): (Int, Int) =
      (bytes.length % 640 + 1, bytes.length % 480 + 1)

    /** "feature-extract" → 16-bin normalized byte histogram. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val h = new Array[Float](16)
      var i = 0
      while (i < bytes.length) { h((bytes(i) & 0xFF) >> 4) += 1f; i += 1 }
      val n = math.max(bytes.length, 1).toFloat
      var j = 0
      while (j < 16) { h(j) /= n; j += 1 }
      h
    }

    /** "frame-sample" → n offsets evenly spaced over the payload. */
    def frameOffsets(bytes: Array[Byte], n: Int): Array[Int] =
      Array.tabulate(n)(i => if (bytes.isEmpty) 0 else (i * bytes.length) / n)

    /** "resize" → deterministic subsample of the payload to `targetLen`
      * bytes (stride sampling — stands in for pixel-space rescale). */
    def resize(bytes: Array[Byte], targetLen: Int): Array[Byte] = {
      if (bytes.length <= targetLen) return bytes
      Array.tabulate(targetLen)(i => bytes((i.toLong * bytes.length / targetLen).toInt))
    }

    /** "perceptual hash" → 64-bit dHash over a 65-sample stride
      * thumbnail: bit i = sample(i) > sample(i+1) (adjacent-gradient
      * signs — the real dHash recipe, with stride sampling standing in
      * for the grayscale rescale). Identical payloads hash identically;
      * local edits perturb only the samples they touch, so near-identical
      * payloads land within small Hamming distance — the behavior a real
      * dHash has under re-encodes. */
    def phash64(bytes: Array[Byte]): Long = {
      if (bytes.isEmpty) return 0L
      val s = new Array[Int](65)
      var i = 0
      while (i < 65) {
        s(i) = bytes(((i.toLong * bytes.length) / 65).toInt) & 0xFF
        i += 1
      }
      var h = 0L
      i = 0
      while (i < 64) { if (s(i) > s(i + 1)) h |= (1L << i); i += 1 }
      h
    }
  }

  private val decodedSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  private val resizedSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("resized", BinaryType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false)))

  /** "Resize" every payload to a fixed byte budget — batch shape identical
    * to [[decodeAndFeaturize]]; swap the stub for a real rescale kernel. */
  def resizeAll(df: DataFrame, idCol: String, mediaCol: String, targetLen: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(resizedSchema)
    df.select(col(idCol).cast("long"), col(mediaCol))
      .mapPartitions { rows =>
        val codec = StubCodec
        rows.map { r =>
          val bytes = r.getStruct(1).getAs[Array[Byte]](0)
          val out = codec.resize(bytes, targetLen)
          Row(r.getLong(0), out, out.length)
        }
      }(enc)
  }

  /** Decode + feature-extract a media table: (id, media struct) →
    * (id, mime, n_bytes, width, height, features[16]).
    *
    * Iterator-to-iterator mapPartitions: the codec (real ones hold native
    * handles) is instantiated once per partition, rows stream through in
    * batch shape — this is the Spark analog of a Pandas-UDF `mapInPandas`
    * pipeline and survives arbitrary partition counts at 100 TB. */
  def decodeAndFeaturize(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    df.select(col(idCol).cast("long"), col(mediaCol))
      .mapPartitions { rows =>
        // per-partition "codec handle" — stub here, JNI context in production
        val codec = StubCodec
        rows.map { r =>
          val id = r.getLong(0)
          val m = r.getStruct(1)
          val bytes = m.getAs[Array[Byte]](0)
          val mime = m.getString(1)
          val (w, h) = codec.dimensions(bytes)
          Row(id, mime, bytes.length, w, h, codec.features(bytes).toSeq)
        }
      }(enc)
  }

  private val frameSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_offset", IntegerType, nullable = false)))

  /** "Frame-sample" every payload: n evenly spaced offsets per media row
    * (video keyframe extraction shape) — one output row per (id, frame).
    * Same per-partition codec-handle batch shape as
    * [[decodeAndFeaturize]]; the real kernel would also slice the bytes
    * at each offset. */
  def frameSample(df: DataFrame, idCol: String, mediaCol: String, n: Int): DataFrame = {
    require(n > 0, "frame count must be positive")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameSchema)
    df.select(col(idCol).cast("long"), col(mediaCol))
      .mapPartitions { rows =>
        val codec = StubCodec
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getStruct(1).getAs[Array[Byte]](0)
          codec.frameOffsets(bytes, n).iterator.zipWithIndex.map {
            case (off, i) => Row(id, i, off)
          }
        }
      }(enc)
  }

  private val phashSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("simhash", LongType, nullable = false)))

  /** Perceptual 64-bit hash per media row — per-partition codec handle,
    * one signature long per payload (the row-local, shuffle-free shape:
    * at 100 TB the image corpus collapses to 8 bytes/row before any
    * dedup join touches it). */
  def phashAll(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(phashSchema)
    df.select(col(idCol).cast("long"), col(mediaCol))
      .mapPartitions { rows =>
        val codec = StubCodec
        rows.map { r =>
          Row(r.getLong(0), codec.phash64(r.getStruct(1).getAs[Array[Byte]](0)))
        }
      }(enc)
  }

  /** Multimodal near-dup pairs: perceptual hash + the pigeonhole-blocked
    * Hamming join text SimHash uses ([[graft.operators.Dedup]]) — dedup
    * is modality-agnostic once rows carry a 64-bit signature. Output
    * (doc_a, doc_b, hamming) with hamming ≤ maxDist, exact over the
    * signatures (full recall by pigeonhole). */
  def perceptualDupPairs(
      df: DataFrame,
      idCol: String,
      mediaCol: String,
      maxDist: Int = 3,
      forceDirect: Boolean = false): DataFrame =
    graft.operators.Dedup.hammingPairs(phashAll(df, idCol, mediaCol), maxDist,
      Some(phashAll(graft.operators.Dedup.hammingProbeSample(df), idCol, mediaCol)),
      forceDirect)
}
