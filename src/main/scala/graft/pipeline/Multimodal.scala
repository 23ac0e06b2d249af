package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads ride as opaque `binary`
  * columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample run per-partition in batches (the Scala analog
  * of `mapInPandas` — an iterator-to-iterator `mapPartitions`, so one
  * executor task streams through a whole parquet row-group without
  * per-row overhead and without materializing the partition).
  *
  * Codec support is REAL for the formats the JDK ships decoders for —
  * PNG / BMP / GIF / JPEG via `javax.imageio` and WAV/PCM via
  * `javax.sound.sampled` — detected from magic bytes ([[sniffFormat]]).
  * Payloads in any other format (or undecodable bytes) take a
  * deterministic byte-level pseudo-decode fallback so the pipeline stays
  * total; the fallback is what the opaque text-as-payload fixtures
  * exercise. Heavier codecs (video containers, EXR, FLAC, …) are where a
  * production deploy would drop a JNI/external library into the same
  * `mapPartitions` host — the plumbing (schema, binary transport, batch
  * shape, partition-parallel execution) does not change.
  */
object Multimodal {

  /** Media metadata schema carried next to every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  /** Decode output: dims + an 8-bucket luminance histogram + per-channel
    * means for real images; byte-derived pseudo stats (null means) for
    * opaque payloads. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("histogram", ArrayType(LongType)),
    StructField("mean_r", IntegerType),
    StructField("mean_g", IntegerType),
    StructField("mean_b", IntegerType)))

  val audioSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("peak_amp", IntegerType),
    StructField("rms_amp", IntegerType)))

  private val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("media", BinaryType),
    StructField("meta", metaSchema)))

  /** Executors must not spool decode scratch to disk files. Applied once
    * per JVM before any ImageIO call. */
  @transient private lazy val imageIoInit: Unit = ImageIO.setUseCache(false)

  /** Magic-byte format detection. Deliberately conservative: a false
    * positive (text that happens to start with "BM") is harmless because
    * the decoder's failure path falls back to the pseudo-decode. */
  def sniffFormat(bytes: Array[Byte]): String = {
    def at(i: Int, v: Int) = i < bytes.length && (bytes(i) & 0xFF) == v
    if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) "image/png"
    else if (at(0, 0xFF) && at(1, 0xD8) && at(2, 0xFF)) "image/jpeg"
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F') && at(3, '8')) "image/gif"
    else if (at(0, 'B') && at(1, 'M') && bytes.length >= 26) "image/bmp"
    else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F') &&
      at(8, 'W') && at(9, 'A') && at(10, 'V') && at(11, 'E')) "audio/wav"
    else "application/octet-stream"
  }

  private def isImage(fmt: String): Boolean = fmt.startsWith("image/")

  /** Wrap a DataFrame's string column as a binary media column + metadata
    * struct (testdata carries no real media; documents' text bytes stand
    * in for opaque payloads). */
  def attachBinary(df: DataFrame, idCol: String,
                   payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("media"),
      struct(lit("fake/raw").as("format"),
        length(col(payloadCol)).cast("long").as("n_bytes")).as("meta"))

  // ---- opaque-payload pseudo-decode (documented fallback, kept
  //      deterministic so opaque pipelines stay oracle-checkable) ----
  private def pseudoDims(bytes: Array[Byte]): (Int, Int) =
    ((bytes.length % 1024) + 1, (bytes.length % 768) + 1)

  private def byteHistogram(bytes: Array[Byte]): Array[Long] = {
    val h = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      h((bytes(i) & 0xFF) >> 5) += 1
      i += 1
    }
    h
  }
  // -------------------------------------------------------------------

  private def decodeImage(bytes: Array[Byte]): Option[BufferedImage] = {
    imageIoInit
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case NonFatal(_) => None }
  }

  /** 8-bucket luminance histogram + integer channel means in one pixel
    * sweep. Means use floor division — exact for solid-color fixtures. */
  private def imageStats(
      img: BufferedImage): (Array[Long], Int, Int, Int) = {
    val h = new Array[Long](8)
    var (sr, sg, sb) = (0L, 0L, 0L)
    val (w, ht) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < ht) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
        sr += r; sg += g; sb += b
        h(((r + g + b) / 3) >> 5) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * ht
    (h, (sr / n).toInt, (sg / n).toInt, (sb / n).toInt)
  }

  /** Batch decode: per-partition iterator pipeline over the binary
    * column, emitting [[decodedSchema]] rows. Real images (PNG / BMP /
    * GIF / JPEG) decode through `javax.imageio`; everything else takes
    * the deterministic pseudo path with the caller-supplied format
    * label, so opaque payloads keep their historical output verbatim. */
  def decode(media: DataFrame): DataFrame = {
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select("id", "media", "meta.format")
      .mapPartitions { it =>
        it.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val sniffed = sniffFormat(bytes)
          val real =
            if (isImage(sniffed)) decodeImage(bytes) else None
          real match {
            case Some(img) =>
              val (hist, mr, mg, mb) = imageStats(img)
              Row(r.getAs[Long]("id"), sniffed, img.getWidth,
                img.getHeight, hist.toSeq, mr, mg, mb)
            case None =>
              val (w, h) = pseudoDims(bytes)
              Row(r.getAs[Long]("id"), r.getAs[String]("format"), w, h,
                byteHistogram(bytes).toSeq, null, null, null)
          }
        }
      }(enc)
  }

  /** WAV/PCM decode via `javax.sound.sampled`: container fields straight
    * from the parsed header, peak/RMS from an actual sample sweep (16-bit
    * signed frames; other sample widths report container fields with
    * zeroed amplitude stats). Non-WAV payloads emit a null-stat row
    * rather than failing the batch. */
  def decodeAudio(media: DataFrame): DataFrame = {
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(audioSchema)
    media.select("id", "media").mapPartitions { it =>
      it.map { r =>
        val id = r.getAs[Long]("id")
        val bytes = r.getAs[Array[Byte]]("media")
        try {
          val ais = AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            val frames = ais.getFrameLength
            var (peak, sumSq, n) = (0L, 0.0, 0L)
            if (fmt.getSampleSizeInBits == 16) {
              val le = !fmt.isBigEndian
              val buf = new Array[Byte](8192)
              var read = ais.read(buf)
              var carry = -1 // split sample across read boundaries
              while (read > 0) {
                var i = 0
                while (i < read) {
                  if (carry >= 0) {
                    val s =
                      if (le) ((buf(i) << 8) | carry).toShort
                      else ((carry << 8) | (buf(i) & 0xFF)).toShort
                    val a = math.abs(s.toLong)
                    if (a > peak) peak = a
                    sumSq += s.toDouble * s; n += 1
                    carry = -1
                  } else carry = buf(i) & 0xFF
                  i += 1
                }
                read = ais.read(buf)
              }
            }
            val rms = if (n == 0) 0 else math.sqrt(sumSq / n).toInt
            Row(id, "audio/wav", fmt.getSampleRate.toInt, fmt.getChannels,
              frames, peak.toInt, rms)
          } finally ais.close()
        } catch {
          case NonFatal(_) => Row(id, sniffFormat(bytes), null, null,
            null, null, null)
        }
      }
    }(enc)
  }

  /** "Resize" an opaque payload to a byte budget: keeps every k-th byte
    * (deterministic). For REAL images use [[resizeImages]] — a byte
    * budget is not a meaningful contract for an encoded bitmap. Output
    * keeps the media-column shape (binary + refreshed metadata), so it
    * composes with [[decode]] / [[sampleFrames]] downstream. */
  def resize(media: DataFrame, maxBytes: Int): DataFrame = {
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(mediaSchema)
    media.select("id", "media", "meta.format").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        val out =
          if (bytes.length <= maxBytes) bytes
          else {
            val step = math.ceil(bytes.length.toDouble / maxBytes).toInt
            (0 until bytes.length by step).map(bytes).toArray
          }
        Row(r.getAs[Long]("id"), out,
          Row(r.getAs[String]("format"), out.length.toLong))
      }
    }(enc)
  }

  /** Real image resample: cap the longest side at `maxDim` (aspect
    * preserved, integer floor division `d * maxDim / max(w, h)`,
    * clamped ≥ 1), redraw through `Graphics2D`, re-encode in the sniffed
    * container. Images already within budget pass through with their
    * original bytes untouched (no decode/re-encode loss); non-image
    * payloads pass through unchanged. */
  def resizeImages(media: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(mediaSchema)
    media.select("id", "media", "meta.format").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        val sniffed = sniffFormat(bytes)
        val resized: Option[Array[Byte]] =
          if (!isImage(sniffed)) None
          else decodeImage(bytes).flatMap { img =>
            val (w, h) = (img.getWidth, img.getHeight)
            val m = math.max(w, h)
            if (m <= maxDim) None
            else {
              val nw = math.max(1, w * maxDim / m)
              val nh = math.max(1, h * maxDim / m)
              val out = new BufferedImage(nw, nh,
                BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try g.drawImage(img, 0, 0, nw, nh, null)
              finally g.dispose()
              val bos = new ByteArrayOutputStream()
              // container name = subtype of the sniffed MIME type
              if (ImageIO.write(out, sniffed.substring(6), bos))
                Some(bos.toByteArray)
              else None
            }
          }
        val outBytes = resized.getOrElse(bytes)
        val fmt =
          if (resized.isDefined) sniffed else r.getAs[String]("format")
        Row(r.getAs[Long]("id"), outBytes,
          Row(fmt, outBytes.length.toLong))
      }
    }(enc)
  }

  /** Frame sampling for "video" payloads: slice `n` evenly-spaced byte
    * windows as stand-in frames; emits one row per frame with the frame
    * index — the real operator's output shape (a video container codec
    * would replace the slicer inside the same partition host). */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    media.select("id", "media").mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        val id = r.getAs[Long]("id")
        (0 until n).iterator.map { f =>
          val start =
            if (bytes.length <= frameBytes) 0
            else (bytes.length - frameBytes).toLong * f / math.max(n - 1, 1)
          Row(id, f, bytes.slice(start.toInt,
            math.min(start.toInt + frameBytes, bytes.length)))
        }
      }
    }(enc)
  }

  // ---- deterministic real-media synthesis (gate fixtures) ----
  // The sandbox's testdata carries no media files, so the oracle-gated
  // real-codec queries (SparkEntry p55_image_decode, p56_audio_decode,
  // p57_image_resize) make their own: per-id solid-color bitmaps and
  // square-wave WAVs whose decoded properties are pure integer
  // arithmetic on the id — expressible in ANSI SQL for the DuckDB gate
  // while the bytes in between are genuine PNG/BMP/WAV containers.
  // MultimodalCodecSpec gates the same round-trips plus the failure
  // paths (corrupt container → pseudo fallback, non-WAV → null stats).

  /** Per-id solid-color image, PNG for even ids / BMP for odd (both
    * lossless, so decoded channel means gate exactly):
    * `w = 16 + id % 48`, `h = 16 + id % 32`,
    * `rgb = (id*31 % 256, id*57 % 256, id*91 % 256)`. */
  def synthesizeImages(df: DataFrame, idCol: String): DataFrame = {
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("id")).mapPartitions { it =>
      imageIoInit
      it.map { r =>
        val id = r.getLong(0)
        val w = 16 + (id % 48).toInt
        val h = 16 + (id % 32).toInt
        val rgb = (((id * 31) % 256).toInt << 16) |
          (((id * 57) % 256).toInt << 8) | ((id * 91) % 256).toInt
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val container = if (id % 2 == 0) "png" else "bmp"
        val bos = new ByteArrayOutputStream()
        ImageIO.write(img, container, bos)
        val bytes = bos.toByteArray
        Row(id, bytes, Row("image/" + container, bytes.length.toLong))
      }
    }(enc)
  }

  /** Per-id mono 16-bit PCM WAV at 8 kHz: a square wave of amplitude
    * `1000 + id % 20000` over `256 + id % 512` frames — peak and RMS
    * both equal the amplitude, frame count reads back exactly. */
  def synthesizeWav(df: DataFrame, idCol: String): DataFrame = {
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val amp = (1000 + id % 20000).toShort
        val n = (256 + id % 512).toInt
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s: Short = if (i % 2 == 0) amp else (-amp).toShort
          pcm(2 * i) = (s & 0xFF).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
          i += 1
        }
        val fmt = new AudioFormat(8000f, 16, 1, true, false)
        val ais = new AudioInputStream(
          new ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new ByteArrayOutputStream()
        AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
        val bytes = bos.toByteArray
        Row(id, bytes, Row("audio/wav", bytes.length.toLong))
      }
    }(enc)
  }
}
