package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata. The Spark-side contract — schema,
  * partition sizing, batch-shaped per-partition processing — is real and
  * tested; the actual codec calls are STUBBED behind `Decoder` (the
  * image/audio libraries are not in this container) with a deterministic
  * fake so tests are reproducible. Swap `Decoder` for a JNI/FFI codec in
  * production; nothing else changes.
  *
  * Scale design: decode runs as `mapPartitions` (the Scala analogue of
  * pandas-batched UDFs) so per-partition setup (codec init) is amortized;
  * blobs never enter a shuffle — all derived features are computed in the
  * same narrow stage and the blob is dropped before any wide operation.
  */
object Multimodal {

  /** Typed metadata carried next to every media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image|audio|video
    StructField("format", StringType),       // png|jpeg|wav|mp4|...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_bytes", LongType)))

  final case class MediaMeta(
      media_type: String, format: String, width: Int, height: Int,
      duration_ms: Long, n_bytes: Long)

  final case class ImageFeatures(
      mean_luma: Double, sharpness: Double, phash: Long)

  /** The codec seam. STUB: ??? for real decoding; the deterministic fake
    * derives stable pseudo-features from the blob bytes so the pipeline
    * shape is testable end-to-end.
    */
  trait Decoder extends Serializable {
    def sniff(bytes: Array[Byte]): MediaMeta
    def imageFeatures(bytes: Array[Byte]): ImageFeatures
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
    def sampleFrames(bytes: Array[Byte], everyMs: Long): Seq[Array[Byte]]
  }

  /** Real codec — intentionally unimplemented in this container. */
  object LibCodecDecoder extends Decoder {
    def sniff(bytes: Array[Byte]): MediaMeta = ???
    def imageFeatures(bytes: Array[Byte]): ImageFeatures = ???
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = ???
    def sampleFrames(bytes: Array[Byte], everyMs: Long): Seq[Array[Byte]] = ???
  }

  /** Deterministic fake: features are hashes of content — stable across
    * runs/partitionings, so specs can golden-test the plumbing.
    */
  object FakeDecoder extends Decoder {
    private def h(bytes: Array[Byte], seed: Long): Long = {
      var x = seed
      var i = 0
      while (i < bytes.length) { x = x * 31 + (bytes(i) & 0xFF); i += 1 }
      x
    }
    def sniff(bytes: Array[Byte]): MediaMeta = {
      val k = h(bytes, 17)
      MediaMeta("image", "fake",
        width = 64 + (math.abs(k) % 1024).toInt,
        height = 64 + (math.abs(k / 7) % 1024).toInt,
        duration_ms = 0L, n_bytes = bytes.length.toLong)
    }
    def imageFeatures(bytes: Array[Byte]): ImageFeatures = {
      val k = h(bytes, 99)
      ImageFeatures(
        mean_luma = (math.abs(k) % 256) / 255.0,
        sharpness = (math.abs(k / 13) % 1000) / 1000.0,
        phash = k)
    }
    def resize(bytes: Array[Byte], w: Int, h0: Int): Array[Byte] =
      bytes.take(math.max(16, math.min(bytes.length, w * h0 / 64)))
    def sampleFrames(bytes: Array[Byte], everyMs: Long): Seq[Array[Byte]] =
      bytes.grouped(math.max(64, bytes.length / 4)).take(4).toSeq
  }

  /** Attach sniffed metadata: one narrow mapPartitions pass, decoder
    * initialized once per partition.
    */
  def withMediaMeta(df: DataFrame, blobCol: String, decoder: Decoder): DataFrame = {
    val schema = df.schema.add("media_meta", mediaMetaSchema)
    val enc = Encoders.row(schema)
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows =>
      // per-partition decoder setup happens here (amortized)
      rows.map { r =>
        val bytes = r.get(blobIdx).asInstanceOf[Array[Byte]]
        val m = decoder.sniff(bytes)
        Row.fromSeq(r.toSeq :+ Row(m.media_type, m.format, m.width, m.height,
          m.duration_ms, m.n_bytes))
      }
    }(enc)
  }

  /** Per-blob image features, batch-shaped. */
  def withImageFeatures(df: DataFrame, blobCol: String, decoder: Decoder): DataFrame = {
    val featSchema = StructType(Seq(
      StructField("mean_luma", DoubleType),
      StructField("sharpness", DoubleType),
      StructField("phash", LongType)))
    val schema = df.schema.add("image_features", featSchema)
    val enc = Encoders.row(schema)
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val f = decoder.imageFeatures(r.get(blobIdx).asInstanceOf[Array[Byte]])
        Row.fromSeq(r.toSeq :+ Row(f.mean_luma, f.sharpness, f.phash))
      }
    }(enc)
  }

  /** Resize: blob → blob, same narrow stage. */
  def resized(df: DataFrame, blobCol: String, w: Int, h: Int, decoder: Decoder): DataFrame = {
    val schema = df.schema.add("resized", BinaryType)
    val enc = Encoders.row(schema)
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ decoder.resize(r.get(blobIdx).asInstanceOf[Array[Byte]], w, h)))
    }(enc)
  }

  /** Frame sampling: one row per sampled frame (flatMap — the UDTF shape). */
  def sampledFrames(df: DataFrame, idCol: String, blobCol: String, everyMs: Long,
      decoder: Decoder): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val enc = Encoders.row(schema)
    df.select(col(idCol).cast(LongType).as("id"), col(blobCol).as("blob"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          decoder.sampleFrames(r.get(1).asInstanceOf[Array[Byte]], everyMs)
            .zipWithIndex.map { case (f, i) => Row(r.getLong(0), i, f) }
        }
      }(enc)
  }

  /** Build a media table from the documents fixture: text bytes stand in
    * for opaque blobs (the container has no codecs — see Decoder).
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
}
