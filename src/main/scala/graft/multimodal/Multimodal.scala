package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * as opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The Spark-side architecture here is the real product: schema contract,
  * partition-sized batch processing via `mapPartitions` over a typed
  * Dataset (the Scala analogue of Python's `mapInPandas` — one iterator per
  * partition, constant memory, no per-row UDF dispatch), and pushdown-safe
  * metadata columns so planning never touches payload bytes.
  *
  * The actual codecs (JPEG/PNG decode, audio resample, video frame-grab)
  * are NOT available in this environment — the decode kernel is a STUB
  * (`DecodeStub`), a deterministic fake that parses our synthetic header.
  * Swap `DecodeStub.decode` for a real codec (e.g. javax.imageio /
  * ffmpeg-cli per partition) without touching any of the plumbing. */
object Multimodal {

  /** The media-table contract: metadata columns first (prunable without
    * reading payloads), payload last. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("payload", BinaryType)))

  final case class MediaRow(
      media_id: Long, kind: String,
      width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], n_frames: Option[Int],
      payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String,
      n_bytes: Long, header_ok: Boolean,
      width: Int, height: Int, n_frames: Int,
      mean_luma_x1000: Long, content_hash: Long)

  /** Deterministic fake codec: payload = 16-byte header
    * [magic(4) | width(4) | height(4) | frames(4)] + body bytes. A real
    * deployment replaces only this object. */
  object DecodeStub {
    val Magic: Int = 0x47524654 // "GRFT"

    def readInt(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    def writeInt(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

    /** Parse header + fake "pixel statistics" over the body. */
    def decode(r: MediaRow): MediaFeatures = {
      val b = r.payload
      val ok = b.length >= 16 && readInt(b, 0) == Magic
      val (w, h, f) =
        if (ok) (readInt(b, 4), readInt(b, 8), readInt(b, 12)) else (0, 0, 0)
      var sum = 0L
      var i = 16
      while (i < b.length) { sum += (b(i) & 0xff); i += 1 }
      val body = math.max(1, b.length - 16)
      MediaFeatures(r.media_id, r.kind, b.length.toLong, ok, w, h, f,
        sum * 1000L / (body * 255L),
        scala.util.hashing.MurmurHash3.bytesHash(b, 0x5eed).toLong)
    }
  }

  /** Build a synthetic media table from the documents fixture: each doc's
    * text bytes become the payload behind a valid stub header. Exercises
    * the binary-column path end-to-end with real (if fake-coded) bytes. */
  def syntheticMedia(spark: SparkSession, docsParquet: String): DataFrame = {
    val docs = spark.read.parquet(docsParquet)
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    val w = (col("doc_id") % 640 + 1).cast("int")
    val h = (col("doc_id") % 480 + 1).cast("int")
    val f = (col("doc_id") % 30 + 1).cast("int")
    docs.select(
      col("doc_id").as("media_id"),
      element_at(kinds, (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      w.as("width"), h.as("height"),
      lit(16000).as("sample_rate"), f.as("n_frames"),
      concat(
        lit(DecodeStub.writeInt(DecodeStub.Magic)),
        binInt(w), binInt(h), binInt(f),
        encode(col("text"), "UTF-8")).as("payload"))
  }

  /** Big-endian int32 → 4 binary bytes, as a column expression. */
  private def binInt(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unhex(lpad(hex(v.cast("long").bitwiseAND(lit(0xFFFFFFFFL))), 8, "0"))

  /** Decode/feature-extract stage: one iterator per partition (constant
    * memory, batch-friendly — the mapInPandas shape). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("media_id", "kind", "width", "height", "sample_rate", "n_frames", "payload")
      .as(Encoders.product[MediaRow])
      .mapPartitions(rows => rows.map(DecodeStub.decode))
  }

  /** Frame-sample stage for video rows: every k-th frame index, as a
    * generator over metadata only (payload untouched — pruning-safe). */
  def sampleFrames(media: DataFrame, everyK: Int = 10): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), coalesce(col("n_frames"), lit(1)) - 1,
          lit(everyK))).as("frame_idx"))

  /** "Resize" planning stage: compute target dims as metadata (the real
    * pixel work would live in DecodeStub). */
  def resizePlan(media: DataFrame, maxSide: Int = 256): DataFrame = {
    val scaleNum = lit(maxSide)
    val longest = greatest(coalesce(col("width"), lit(1)), coalesce(col("height"), lit(1)))
    media.select(col("media_id"), col("kind"), col("width"), col("height"),
      when(longest <= maxSide, col("width"))
        .otherwise((col("width") * scaleNum / longest).cast("int")).as("target_w"),
      when(longest <= maxSide, col("height"))
        .otherwise((col("height") * scaleNum / longest).cast("int")).as("target_h"))
  }
}
