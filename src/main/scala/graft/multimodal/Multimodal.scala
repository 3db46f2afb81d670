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
  * Image payloads are REAL PNGs decoded with `javax.imageio` (JDK-builtin —
  * width/height/mean-luma come from actual pixel data). Audio/video codecs
  * are not available in this environment, so those kinds carry the
  * deterministic `DecodeStub` header format; swap `DecodeStub.decode` for a
  * real codec (ffmpeg-cli per partition) without touching the plumbing. */
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

  /** Decoded per-media features. `mean_luma_x1000` is the generic "mean
    * signal level" per-mille: pixel luma / 255 for images, |amplitude| /
    * 2^15 for audio. `sample_rate` is the DECODED rate (0 for non-audio). */
  final case class MediaFeatures(
      media_id: Long, kind: String,
      n_bytes: Long, header_ok: Boolean,
      width: Int, height: Int, n_frames: Int, sample_rate: Int,
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
        sample_rate = 0, sum * 1000L / (body * 255L),
        scala.util.hashing.MurmurHash3.bytesHash(b, 0x5eed).toLong)
    }
  }

  /** Real audio codec over `javax.sound.sampled` (JDK-builtin): WAV
    * payloads are decoded to actual PCM frames — frame count, sample rate
    * and mean |amplitude| (per-mille of 2^15 full scale) come from the
    * decoded signal, not a header field. 16-bit PCM mono/stereo, either
    * endianness. */
  object AudioCodec {
    def isWav(b: Array[Byte]): Boolean =
      b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    /** Deterministic really-encoded WAV: 16-bit signed little-endian PCM
      * mono. The JDK WAVE writer emits the canonical 44-byte container
      * header, so payload size is exactly 44 + 2·samples. */
    def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    def decode(r: MediaRow): MediaFeatures = try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      val fmt = ais.getFormat
      val bytes = ais.readAllBytes()
      val frameSize = math.max(1, fmt.getFrameSize)
      val frames = bytes.length / frameSize
      val big = fmt.isBigEndian
      var sum = 0L
      var i = 0
      while (i + 1 < bytes.length) {
        val s =
          if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
          else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
        sum += math.abs(s.toLong)
        i += 2
      }
      val nSamples = math.max(1L, bytes.length / 2L)
      MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, header_ok = true,
        width = 0, height = 0, n_frames = frames,
        sample_rate = fmt.getSampleRate.toInt,
        mean_luma_x1000 = sum * 1000L / (nSamples * 32768L),
        content_hash = scala.util.hashing.MurmurHash3.bytesHash(r.payload, 0x5eed).toLong)
    } catch {
      // truncated/corrupt container: degrade to header_ok=false instead of
      // killing the task on one bad row (same contract as ImageCodec)
      case _: Exception =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, header_ok = false,
          0, 0, 0, 0, 0L,
          scala.util.hashing.MurmurHash3.bytesHash(r.payload, 0x5eed).toLong)
    }
  }

  /** Real image codec over `javax.imageio` (JDK-builtin): PNG payloads are
    * decoded to actual pixels; mean luma is the per-pixel (r+g+b)/3 average
    * as an exact integer per-mille of 255. Single-frame by definition. */
  object ImageCodec {
    def isPng(b: Array[Byte]): Boolean =
      b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

    /** Deterministic tiny PNG: w×h constant-gray image, really encoded. */
    def pngBytes(w: Int, h: Int, gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    def decode(r: MediaRow): MediaFeatures = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      // a payload can pass the magic check yet be truncated/corrupt —
      // ImageIO.read returns null; degrade to header_ok=false instead of
      // NPE-killing the task on one bad row
      if (img == null)
        return MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          header_ok = false, 0, 0, 0, 0, 0L,
          scala.util.hashing.MurmurHash3.bytesHash(r.payload, 0x5eed).toLong)
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sum += ((p >> 16 & 0xff) + (p >> 8 & 0xff) + (p & 0xff)) / 3
          x += 1
        }
        y += 1
      }
      MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, header_ok = true,
        w, h, n_frames = 1, sample_rate = 0, sum * 1000L / (w.toLong * h * 255L),
        scala.util.hashing.MurmurHash3.bytesHash(r.payload, 0x5eed).toLong)
    }
  }

  /** Real-frame video container: since no video codec ships with the JDK,
    * the "video" format is a minimal homegrown container of REALLY-encoded
    * PNG frames — `[magic "GFV1" | n_frames(4)] + n × [len(4) | png]` —
    * so frame extraction genuinely parses the container and decodes
    * pixels, exercising the same plumbing a real codec would (swap
    * [[decodeFrame]] for an ffmpeg call without touching anything else). */
  object VideoCodec {
    val Magic: Int = 0x47465631 // "GFV1"

    def isGfv(b: Array[Byte]): Boolean =
      b.length >= 8 && DecodeStub.readInt(b, 0) == Magic

    def videoBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(DecodeStub.writeInt(Magic))
      out.write(DecodeStub.writeInt(frames.length))
      frames.foreach { f => out.write(DecodeStub.writeInt(f.length)); out.write(f) }
      out.toByteArray
    }

    /** Frame offsets (start of each png) — container parse only. */
    def frameOffsets(b: Array[Byte]): Seq[(Int, Int)] = {
      val n = DecodeStub.readInt(b, 4)
      var off = 8
      (0 until n).map { _ =>
        val len = DecodeStub.readInt(b, off)
        val r = (off + 4, len)
        off += 4 + len
        r
      }
    }

    /** Decode one frame's pixels (real ImageIO). */
    def decodeFrame(b: Array[Byte], off: Int, len: Int): java.awt.image.BufferedImage =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.slice(off, off + len)))

    /** Whole-payload features: first frame's dims, mean luma across ALL
      * frames' pixels (exact integer per-mille). */
    def decode(r: MediaRow): MediaFeatures = try {
      val offs = frameOffsets(r.payload)
      var sum = 0L
      var pixels = 0L
      var w = 0
      var h = 0
      offs.foreach { case (off, len) =>
        val img = decodeFrame(r.payload, off, len)
        if (w == 0) { w = img.getWidth; h = img.getHeight }
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sum += ((p >> 16 & 0xff) + (p >> 8 & 0xff) + (p & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        pixels += img.getWidth.toLong * img.getHeight
      }
      MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, header_ok = true,
        w, h, n_frames = offs.length, sample_rate = 0,
        mean_luma_x1000 = if (pixels > 0) sum * 1000L / (pixels * 255L) else 0L,
        content_hash = scala.util.hashing.MurmurHash3.bytesHash(r.payload, 0x5eed).toLong)
    } catch {
      case _: Exception =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, header_ok = false,
          0, 0, 0, 0, 0L,
          scala.util.hashing.MurmurHash3.bytesHash(r.payload, 0x5eed).toLong)
    }
  }

  /** Build a synthetic media table from the documents fixture: image rows
    * carry REAL PNG payloads (constant gray = doc_id % 256, dims
    * (id%64+1)×(id%48+1)); audio rows carry REAL 16 kHz WAV payloads
    * (constant amplitude (id%256)·128, (id%30+1) samples); video rows
    * carry the real-frame container — (id%30+1) genuinely PNG-encoded
    * frames, frame i constant gray (id+i)%256. All three kinds are
    * really encoded and really decoded. */
  def syntheticMedia(spark: SparkSession, docsParquet: String): DataFrame = {
    import spark.implicits._
    implicit val enc = Encoders.product[MediaRow]
    spark.read.parquet(docsParquet)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, _) =>
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val (w, h, f) = ((id % 64 + 1).toInt, (id % 48 + 1).toInt, (id % 30 + 1).toInt)
        kind match {
          case "image" =>
            MediaRow(id, kind, Some(w), Some(h), None, Some(1),
              ImageCodec.pngBytes(w, h, (id % 256).toInt))
          case "audio" =>
            val amp = ((id % 256) * 128).toShort
            MediaRow(id, kind, None, None, Some(16000), Some(f),
              AudioCodec.wavBytes(16000, Array.fill(f)(amp)))
          case _ =>
            MediaRow(id, kind, Some(w), Some(h), None, Some(f),
              VideoCodec.videoBytes((0 until f).map(i =>
                ImageCodec.pngBytes(w, h, ((id + i) % 256).toInt))))
        }
      }).toDF()
  }

  /** Decode/feature-extract stage: one iterator per partition (constant
    * memory, batch-friendly — the mapInPandas shape). PNG payloads take
    * the real ImageIO path, WAV payloads the real javax.sound path, GFV
    * containers the real per-frame video path; only unrecognized
    * stub-magic payloads fall back to the fake codec. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("media_id", "kind", "width", "height", "sample_rate", "n_frames", "payload")
      .as(Encoders.product[MediaRow])
      .mapPartitions(_.map { r =>
        if (ImageCodec.isPng(r.payload)) ImageCodec.decode(r)
        else if (AudioCodec.isWav(r.payload)) AudioCodec.decode(r)
        else if (VideoCodec.isGfv(r.payload)) VideoCodec.decode(r)
        else DecodeStub.decode(r)
      })
  }

  /** Frame-sample stage for video rows: every k-th frame index, as a
    * generator over metadata only (payload untouched — pruning-safe). */
  def sampleFrames(media: DataFrame, everyK: Int = 10): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), coalesce(col("n_frames"), lit(1)) - 1,
          lit(everyK))).as("frame_idx"))

  final case class FrameFeatures(
      media_id: Long, frame_idx: Int, width: Int, height: Int, mean_luma_x1000: Long)

  /** REAL frame extraction: every k-th frame of each video payload is
    * parsed out of the container and pixel-decoded (ImageIO), one
    * iterator per partition — only the sampled frames are decoded, the
    * rest are skipped by offset arithmetic (the mapInPandas shape a
    * production decoder would use; payload bytes ride the scan once). */
  def sampleFrameFeatures(media: DataFrame, everyK: Int = 10): Dataset[FrameFeatures] = {
    implicit val enc = Encoders.product[FrameFeatures]
    media.filter(col("kind") === "video")
      .select("media_id", "kind", "width", "height", "sample_rate", "n_frames", "payload")
      .as(Encoders.product[MediaRow])
      .mapPartitions(_.flatMap { r =>
        if (!VideoCodec.isGfv(r.payload)) Iterator.empty
        else VideoCodec.frameOffsets(r.payload).zipWithIndex.iterator
          .filter(_._2 % everyK == 0)
          .map { case ((off, len), idx) =>
            val img = VideoCodec.decodeFrame(r.payload, off, len)
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val p = img.getRGB(x, y)
                sum += ((p >> 16 & 0xff) + (p >> 8 & 0xff) + (p & 0xff)) / 3
                x += 1
              }
              y += 1
            }
            FrameFeatures(r.media_id, idx, img.getWidth, img.getHeight,
              sum * 1000L / (img.getWidth.toLong * img.getHeight * 255L))
          }
      })
  }

  final case class KeyFrame(
      media_id: Long, frame_idx: Int, luma_x1000: Long, delta_x1000: Long)

  /** Scene-cut / keyframe detection — the selection step of a video
    * training pipeline (decode everything, KEEP only frames where content
    * changes): one sequential pass per video decodes each frame, tracks
    * the previous frame's mean luma, and emits frame 0 plus every frame
    * whose luma delta is ≥ `thresholdX1000` (of the 0–1000 luma scale).
    * Per-partition iterator over payload bytes that already rode the scan —
    * the same mapPartitions shape as the samplers; state is one long per
    * in-flight video. */
  def sceneCuts(media: DataFrame, thresholdX1000: Long = 500L): Dataset[KeyFrame] = {
    implicit val enc = Encoders.product[KeyFrame]
    media.filter(col("kind") === "video")
      .select("media_id", "kind", "width", "height", "sample_rate", "n_frames", "payload")
      .as(Encoders.product[MediaRow])
      .mapPartitions(_.flatMap { r =>
        if (!VideoCodec.isGfv(r.payload)) Iterator.empty
        else {
          var prev = 0L
          VideoCodec.frameOffsets(r.payload).zipWithIndex.iterator
            .flatMap { case ((off, len), idx) =>
              val img = VideoCodec.decodeFrame(r.payload, off, len)
              var sum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val p = img.getRGB(x, y)
                  sum += ((p >> 16 & 0xff) + (p >> 8 & 0xff) + (p & 0xff)) / 3
                  x += 1
                }
                y += 1
              }
              val luma = sum * 1000L / (img.getWidth.toLong * img.getHeight * 255L)
              val delta = if (idx == 0) 0L else math.abs(luma - prev)
              prev = luma
              if (idx == 0 || delta >= thresholdX1000)
                Some(KeyFrame(r.media_id, idx, luma, delta))
              else None
            }
        }
      })
  }

  /** REAL audio resample (decimation): WAV payloads are decoded to PCM,
    * every `factor`-th sample kept, and re-encoded at `rate/factor` — the
    * audio analog of [[resizeImages]] (decode → transform → re-encode),
    * completing the per-modality transform matrix (image resize, video
    * frame sampling, audio resampling). Non-audio rows pass through
    * untouched; constant memory per partition. */
  def resampleAudio(media: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    implicit val enc = Encoders.product[MediaRow]
    media.select("media_id", "kind", "width", "height", "sample_rate", "n_frames", "payload")
      .as(Encoders.product[MediaRow])
      .mapPartitions(_.map { r =>
        if (!AudioCodec.isWav(r.payload)) r
        else try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val fmt = ais.getFormat
          // the decimation walk below indexes 16-bit MONO PCM frames — a
          // stereo/8-bit/24-bit/float WAV would be decimated across
          // interleaved channel or sample bytes into a corrupt payload, so
          // anything else passes through untouched like non-WAV rows
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) r
          else {
            val bytes = ais.readAllBytes()
            val big = fmt.isBigEndian
            val n = bytes.length / 2
            val kept = new Array[Short]((n + factor - 1) / factor)
            var i = 0
            while (i * factor < n) {
              val o = i * factor * 2
              kept(i) =
                if (big) ((bytes(o) << 8) | (bytes(o + 1) & 0xff)).toShort
                else ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort
              i += 1
            }
            val newRate = math.max(1, fmt.getSampleRate.toInt / factor)
            r.copy(sample_rate = Some(newRate), n_frames = Some(kept.length),
              payload = AudioCodec.wavBytes(newRate, kept))
          }
        } catch { case _: Exception => r } // corrupt container: pass through
      }).toDF()
  }

  /** REAL image resize (Graphics2D bilinear): image payloads are decoded,
    * scaled so the longest side is ≤ maxSide (aspect preserved, floor
    * arithmetic matching [[resizePlan]]), and re-encoded as PNG. Non-image
    * rows pass through untouched. */
  def resizeImages(media: DataFrame, maxSide: Int = 256): DataFrame = {
    implicit val enc = Encoders.product[MediaRow]
    media.select("media_id", "kind", "width", "height", "sample_rate", "n_frames", "payload")
      .as(Encoders.product[MediaRow])
      .mapPartitions(_.map { r =>
        if (!ImageCodec.isPng(r.payload)) r
        else {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          if (img == null) r
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val longest = math.max(w, h)
            if (longest <= maxSide) r
            else {
              val (tw, th) = (math.max(1, w * maxSide / longest), math.max(1, h * maxSide / longest))
              val out = new java.awt.image.BufferedImage(tw, th,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, tw, th, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              r.copy(width = Some(tw), height = Some(th), payload = bos.toByteArray)
            }
          }
        }
      }).toDF()
  }

  /** Synthetic BLOCK-patterned images for the perceptual-hash operators:
    * one 32×32 PNG per image-kind doc id (id % 3 == 0), an 8×8 grid of
    * 4×4-pixel constant-gray blocks with
    * `luma(i, j) = (seed·31 + i·8 + j·17) % 256`, `seed = id % 40` — ids
    * sharing a seed are EXACT duplicates; ids with `id % 7 == 0`
    * additionally bump block (0,0) by +8 (mod 256), a near-duplicate
    * variant. Really PNG-encoded, really decoded; every hash bit is pure
    * integer arithmetic of the id, so a SQL oracle replays the whole
    * pipeline. */
  def syntheticBlockImages(spark: SparkSession, docsParquet: String): DataFrame = {
    import spark.implicits._
    implicit val enc = Encoders.product[MediaRow]
    spark.read.parquet(docsParquet).select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 0)
      .mapPartitions(_.map { id =>
        val seed = id % 40
        val img = new java.awt.image.BufferedImage(32, 32,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < 8) {
          var j = 0
          while (j < 8) {
            val base = (seed * 31 + i * 8 + j * 17) % 256
            val v = (if (id % 7 == 0 && i == 0 && j == 0) (base + 8) % 256
              else base).toInt
            val rgb = (v << 16) | (v << 8) | v
            var y = i * 4
            while (y < (i + 1) * 4) {
              var x = j * 4
              while (x < (j + 1) * 4) { img.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            j += 1
          }
          i += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        MediaRow(id, "image", Some(32), Some(32), None, Some(1), out.toByteArray)
      }).toDF()
  }

  final case class ImageSig(media_id: Long, ahash: Long)

  /** Perceptual average-hash over REAL decoded pixels: the image is block-
    * averaged onto a `grid`×`grid` luma matrix (pixel (x,y) → cell
    * (y·g/h, x·g/w) — exact integer partition, any dims) and bit
    * (i·g + j) is set iff the cell's mean luma EXCEEDS the global mean.
    * The comparison is the division-free cross-multiply
    * `cellSum · totalPixels > totalSum · cellPixels` — exact integers end
    * to end, so the hash is reproducible from pixel values alone (and by
    * a SQL oracle). Undecodable payloads are dropped. One sequential
    * decode pass per partition, constant memory. */
  def imageAHashes(media: DataFrame, grid: Int = 8): Dataset[ImageSig] = {
    require(grid >= 2 && grid * grid <= 64, s"grid² must fit 64 bits, got $grid")
    implicit val enc = Encoders.product[ImageSig]
    // spread: per-row PNG decode is the heaviest kernel in the repo — a
    // one-row-group media file must not decode on a single core
    graft.operators.Caching.spread(
        media.filter(col("kind") === "image")
          .select("media_id", "kind", "width", "height", "sample_rate",
            "n_frames", "payload"))
      .as(Encoders.product[MediaRow])
      .mapPartitions(_.flatMap { r =>
        if (!ImageCodec.isPng(r.payload)) None
        else {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          if (img == null) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val sums = Array.ofDim[Long](grid * grid)
            val counts = Array.ofDim[Long](grid * grid)
            var y = 0
            while (y < h) {
              val ci = y.toLong * grid / h
              var x = 0
              while (x < w) {
                val cj = x.toLong * grid / w
                val p = img.getRGB(x, y)
                val cell = (ci * grid + cj).toInt
                sums(cell) += ((p >> 16 & 0xff) + (p >> 8 & 0xff) + (p & 0xff)) / 3
                counts(cell) += 1
                x += 1
              }
              y += 1
            }
            val totalSum = sums.sum
            val totalPixels = w.toLong * h
            var sig = 0L
            var c = 0
            while (c < grid * grid) {
              // BigInt: sums are ≤ 255·w·h, so the cross-multiply can
              // exceed Long for very large images
              if (BigInt(sums(c)) * totalPixels > BigInt(totalSum) * counts(c))
                sig |= 1L << c
              c += 1
            }
            Some(ImageSig(r.media_id, sig))
          }
        }
      })
  }

  /** Near-duplicate image pairs: hamming(aHash) ≤ maxHamming, via the
    * pigeonhole band join (maxHamming+1 equal-width signature bands — a
    * qualifying pair matches exactly on ≥ 1 band), then exact popcount
    * verification. The same LSH shape as the text simhash pairs: bucketed
    * candidates, never a cross join. */
  def imageNearDupPairs(
      media: DataFrame, grid: Int = 8, maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    require(64 % nBands == 0, s"maxHamming+1 must divide 64, got $nBands")
    val bandBits = 64 / nBands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val sigs = imageAHashes(media, grid).toDF()
    val banded = sigs.select(col("media_id"), col("ahash"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("ahash"), b * bandBits).bitwiseAND(lit(mask)).as("key"))
      }: _*)).as("bk"))
      .select(col("media_id"), col("ahash"), col("bk.band"), col("bk.key"))
    val cand = banded.select(col("band"), col("key"),
        col("media_id").as("id_a"), col("ahash").as("sig_a"))
      .join(banded.select(col("band"), col("key"),
        col("media_id").as("id_b"), col("ahash").as("sig_b")), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

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
