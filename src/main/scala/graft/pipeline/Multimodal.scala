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
  * PNG / BMP / GIF / JPEG via `javax.imageio`, WAV/PCM via
  * `javax.sound.sampled` — and for RIFF/AVI video containers with
  * uncompressed DIB frames OR Motion-JPEG streams (each `00dc` chunk a
  * standalone JPEG, decoded per frame through the same `javax.imageio`
  * path — a genuinely COMPRESSED video codec end to end) via the
  * engine's own chunk walker ([[sampleVideoFrames]]) — and for FLAC
  * audio via the engine's own pure-JVM decoder ([[Flac]]: all subframe
  * types, partitioned Rice, CRC-verified). Formats are
  * detected from magic bytes ([[sniffFormat]]); payloads in any other
  * format (or undecodable bytes) take a deterministic byte-level
  * pseudo-decode fallback so the pipeline stays total — the fallback
  * is what the opaque text-as-payload fixtures exercise. The remaining
  * compressed codecs (H.264/H.265 inside MP4) plug into the same
  * `mapPartitions` host through a REGISTERED seam
  * ([[registerVideoCodec]]): a production deploy registers a
  * JNI-backed [[VideoFrameDecoder]] per executor JVM and the plumbing
  * (schema, binary transport, batch shape, container walk,
  * partition-parallel execution) does not change — exercised end to
  * end by MultimodalCodecSpec's fake-avc1 test, exactly as the MJPEG
  * and FLAC paths demonstrate for real.
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
    else if (at(0, 'f') && at(1, 'L') && at(2, 'a') && at(3, 'C'))
      "audio/flac"
    else if (at(0, 0x76) && at(1, 0x2F) && at(2, 0x31) && at(3, 0x01))
      "image/exr"
    else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F') &&
      at(8, 'A') && at(9, 'V') && at(10, 'I') && at(11, ' ')) "video/avi"
    else if (at(4, 'f') && at(5, 't') && at(6, 'y') && at(7, 'p'))
      "video/mp4"
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

  /** Per-thread JPEG reader (r16 optimization): `ImageIO.read` scans
    * the plugin registry and constructs + disposes a JPEGImageReader
    * (native init included) PER CALL — measured as a dominant cost of
    * Motion-JPEG frame decode, where every frame is a tiny standalone
    * JPEG. `setInput` fully resets a reader between uses, and the
    * instance is the exact plugin `ImageIO.read` would pick, invoked
    * with the same `(iis, seekForwardOnly = true, ignoreMetadata =
    * true)` + `read(0)` contract — identical pixels. Task threads are
    * pooled, so at most one reader per executor thread ever exists;
    * any decode failure discards the thread's instance and falls back
    * to the stock path for that payload. */
  @transient private lazy val jpegReaderTl
      : ThreadLocal[javax.imageio.ImageReader] =
    ThreadLocal.withInitial(() =>
      ImageIO.getImageReadersByFormatName("jpeg").next())

  private def decodeImage(bytes: Array[Byte]): Option[BufferedImage] = {
    imageIoInit
    if (sniffFormat(bytes) == "image/jpeg") {
      try {
        val reader = jpegReaderTl.get()
        val iis = ImageIO.createImageInputStream(
          new ByteArrayInputStream(bytes))
        try {
          reader.setInput(iis, true, true)
          return Option(reader.read(0))
        } finally iis.close()
      } catch {
        case NonFatal(_) =>
          // dispose before dropping the ThreadLocal: the plugin holds
          // native resources that would otherwise wait for GC
          try jpegReaderTl.get().dispose() catch { case NonFatal(_) => }
          jpegReaderTl.remove() // fall through
      }
    }
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case NonFatal(_) => None }
  }

  /** 8-bucket luminance histogram + integer channel means in one pixel
    * sweep. Means use floor division — exact for solid-color fixtures.
    *
    * Fast path (r16 optimization): for the 3-band byte-interleaved
    * sRGB rasters the JDK decoders produce (TYPE_3BYTE_BGR from the
    * JPEG/BMP readers), the channel bytes are read straight from the
    * data buffer via the sample model's own strides/offsets —
    * `getRGB` routes every pixel through ColorModel conversion and
    * returns exactly those bytes for this layout, so the sums are
    * identical; anything else keeps the getRGB path. */
  private def imageStats(
      img: BufferedImage): (Array[Long], Int, Int, Int) = {
    val h = new Array[Long](8)
    var (sr, sg, sb) = (0L, 0L, 0L)
    val (w, ht) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    (raster.getSampleModel, raster.getDataBuffer) match {
      case (sm: java.awt.image.PixelInterleavedSampleModel,
            db: java.awt.image.DataBufferByte)
          if sm.getNumBands == 3 && db.getNumBanks == 1 &&
            db.getOffset == 0 && raster.getMinX == 0 &&
            raster.getMinY == 0 &&
            raster.getSampleModelTranslateX == 0 &&
            raster.getSampleModelTranslateY == 0 &&
            img.getColorModel.getColorSpace.isCS_sRGB &&
            img.getColorModel.getTransferType ==
              java.awt.image.DataBuffer.TYPE_BYTE &&
            img.getColorModel.getComponentSize.forall(_ == 8) &&
            !img.getColorModel.hasAlpha =>
        val data = db.getData
        val scan = sm.getScanlineStride
        val pix = sm.getPixelStride
        val off = sm.getBandOffsets // sample order: band 0=R, 1=G, 2=B
        var y = 0
        while (y < ht) {
          var p = y * scan
          var x = 0
          while (x < w) {
            val r = data(p + off(0)) & 0xFF
            val g = data(p + off(1)) & 0xFF
            val b = data(p + off(2)) & 0xFF
            sr += r; sg += g; sb += b
            h(((r + g + b) / 3) >> 5) += 1
            p += pix
            x += 1
          }
          y += 1
        }
      case _ =>
        var y = 0
        while (y < ht) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF
            val b = p & 0xFF
            sr += r; sg += g; sb += b
            h(((r + g + b) / 3) >> 5) += 1
            x += 1
          }
          y += 1
        }
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
  /** FLAC leg of [[decodeAudio]]: the engine's own decoder
    * ([[Flac.decode]] — a real COMPRESSED audio codec, the audio twin
    * of the Motion-JPEG video path). Same stat contract as the WAV leg:
    * container fields from the parsed stream, peak/RMS from an actual
    * sample sweep. */
  private def flacStats(id: Long, bytes: Array[Byte]): Option[Row] =
    Flac.decode(bytes).map { case (info, samples) =>
      var (peak, sumSq) = (0L, 0.0)
      var i = 0
      while (i < samples.length) {
        val a = math.abs(samples(i).toLong)
        if (a > peak) peak = a
        sumSq += samples(i).toDouble * samples(i)
        i += 1
      }
      val rms =
        if (samples.isEmpty) 0 else math.sqrt(sumSq / samples.length).toInt
      Row(id, "audio/flac", info.sampleRate, info.channels,
        samples.length.toLong / info.channels, peak.toInt, rms)
    }

  def decodeAudio(media: DataFrame): DataFrame = {
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(audioSchema)
    media.select("id", "media").mapPartitions { it =>
      it.map { r =>
        val id = r.getAs[Long]("id")
        val bytes = r.getAs[Array[Byte]]("media")
        val flac =
          if (sniffFormat(bytes) == "audio/flac") flacStats(id, bytes)
          else None
        if (flac.isDefined) flac.get
        else try {
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

  // ---- real video container: RIFF/AVI with uncompressed DIB frames --

  /** Video frame-sampling output: container frame count + per-sampled-
    * frame dims and exact channel means (frames are uncompressed RGB24,
    * so nothing is lossy). */
  val videoFrameSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("n_frames", IntegerType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", IntegerType),
    StructField("mean_g", IntegerType),
    StructField("mean_b", IntegerType)))

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def fourcc(b: Array[Byte], o: Int): String =
    if (o + 4 <= b.length)
      new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "US-ASCII")
    else ""

  /** Generic RIFF/AVI walk — no assumptions beyond the container spec:
    * finds the video stream's BITMAPINFOHEADER (`strf` under `hdrl`,
    * 24-bit BI_RGB only) and the `movi` frame chunks (`##db`/`##dc`,
    * even-padded). Returns (width, height, frame chunk offsets+sizes)
    * or None for anything that doesn't parse. Reference analog: the
    * reference has no media layer at all — this is the engine's own
    * answer to frame sampling without an external codec dependency. */
  /** RIFF/AVI walk. The returned codec tag is `"dib"` (uncompressed
    * RGB24 DIB frames, `biCompression == 0`) or `"mjpg"` (Motion JPEG —
    * each frame chunk is a standalone JPEG image; `biCompression ==
    * 'MJPG'`): MJPEG is the one COMPRESSED video codec the stock JDK
    * can fully decode (each frame goes through the same `javax.imageio`
    * JPEG path the image operators use), so the AVI family covers a
    * real compressed-codec decode end to end without the JNI seam. */
  private def parseAvi(b: Array[Byte])
      : Option[(Int, Int, IndexedSeq[(Int, Int)], String)] = {
    if (sniffFormat(b) != "video/avi" || b.length < 24) return None
    var w = -1; var h = -1; var depth = -1; var comp = ""
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val cc = fourcc(b, o)
        val size = le32(b, o + 4)
        if (size < 0 || o + 8 + size > to) return // torn chunk: stop
        if (cc == "LIST" && size >= 4) {
          val listType = fourcc(b, o + 8)
          // hdrl carries the headers, movi the frames; recurse into both
          if (listType == "hdrl" || listType == "strl" ||
              listType == "movi")
            walk(o + 12, o + 8 + size)
        } else if (cc == "strf" && depth < 0 && size >= 40) {
          // first BITMAPINFOHEADER wins (single-video-stream container)
          w = le32(b, o + 8 + 4)
          h = le32(b, o + 8 + 8)
          depth = le16(b, o + 8 + 14)
          comp = if (le32(b, o + 8 + 16) == 0) "dib"
            else fourcc(b, o + 8 + 16)
        } else if (cc.length == 4 && cc.charAt(2) == 'd' &&
            (cc.charAt(3) == 'b' || cc.charAt(3) == 'c') &&
            cc.charAt(0).isDigit && cc.charAt(1).isDigit) {
          frames += ((o + 8, size))
        }
        o += 8 + size + (size & 1) // chunks are even-padded
      }
    }
    if (fourcc(b, 8) != "AVI ") return None
    walk(12, math.min(b.length, 8 + le32(b, 4)))
    val codec = comp match {
      case "dib" if depth == 24 => "dib"
      case "MJPG"               => "mjpg"
      case _                    => "" // unsupported codec → pseudo path
    }
    if (w <= 0 || h <= 0 || codec.isEmpty || frames.isEmpty) None
    else Some((w, h, frames.toIndexedSeq, codec))
  }

  // ---- ISO-BMFF (MP4/QuickTime) container walk — the OTHER container
  //      family real pipelines ship, beside RIFF/AVI ----
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
  private def be64(b: Array[Byte], o: Int): Long =
    ((be32(b, o) & 0xFFFFFFFFL) << 32) | (be32(b, o + 4) & 0xFFFFFFFFL)

  /** Iterate ISO-BMFF boxes in `[from, to)`: (type, payloadFrom,
    * payloadTo). Handles the spec's three size encodings — normal,
    * size==1 (64-bit largesize follows the type), size==0 (extends to
    * the enclosing container's end). Stops cleanly at a torn box. */
  private def mp4Boxes(b: Array[Byte], lo: Int,
                       hi: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var o = lo
      def hasNext: Boolean = o + 8 <= hi
      def next(): (String, Int, Int) = {
        val size32 = be32(b, o)
        val tpe = fourcc(b, o + 4)
        def clamp(payload: Int) = { val r = (tpe, payload, hi); o = hi; r }
        if (size32 == 0) clamp(o + 8) // box runs to container end
        else if (size32 == 1) {
          if (o + 16 > hi) clamp(o + 16)
          else {
            val ls = be64(b, o + 8)
            if (ls < 16 || o + ls > hi) clamp(o + 16) // torn: clamp
            else { val end = o + ls.toInt; val r = (tpe, o + 16, end)
              o = end; r }
          }
        } else if (size32 < 8 || o + size32 > hi) clamp(o + 8) // torn
        else { val end = o + size32; val r = (tpe, o + 8, end); o = end; r }
      }
    }

  /** One compressed video sample → (width, height, meanR, meanG,
    * meanB), or None when the sample is undecodable. Receives the
    * WHOLE payload plus the sample's (offset, size) extent so a codec
    * can slice without copying. This is the plug-in contract for the
    * codecs the JVM cannot decode (H.264/H.265) — a production deploy
    * registers a JNI-backed decoder per executor JVM (the natural
    * grain for a native codec context) and the container walk,
    * sampling host, schema and partitioning are untouched. */
  type VideoFrameDecoder =
    (Array[Byte], Int, Int) => Option[(Int, Int, Int, Int, Int)]

  private val videoCodecs = new java.util.concurrent
    .ConcurrentHashMap[String, VideoFrameDecoder]()

  /** Register a decoder for an MP4 sample-entry fourcc (e.g. "avc1",
    * "hev1"). Per-JVM: on a cluster, call from each executor (a JNI
    * codec's own static init is the idiomatic place). */
  def registerVideoCodec(fourcc: String, dec: VideoFrameDecoder): Unit = {
    require(fourcc.length == 4, s"fourcc must be 4 chars: '$fourcc'")
    videoCodecs.put(fourcc, dec)
  }

  def unregisterVideoCodec(fourcc: String): Unit =
    videoCodecs.remove(fourcc)

  /** Walk an MP4's `moov` for the first VIDEO track with either an
    * uncompressed `raw ` 24-bit sample entry or a sample entry whose
    * fourcc has a [[registerVideoCodec registered]] decoder, and expand
    * its sample tables (stsd + stsz + stsc + stco — the real chunk-run
    * expansion, not a 1:1 shortcut) into absolute (offset, size) frame
    * extents plus the sample-entry fourcc. Compressed entries without a
    * registered decoder (avc1, hev1, …) reject here — the documented
    * JNI seam. Returns None for anything torn or not a parseable video
    * MP4 (caller falls back to the null-stat row). */
  private def parseMp4(b: Array[Byte])
      : Option[(Int, Int, String, IndexedSeq[(Int, Int)])] = {
    if (sniffFormat(b) != "video/mp4") return None
    mp4Boxes(b, 0, b.length).collectFirst {
      case ("moov", mf, mt) => (mf, mt)
    }.flatMap { case (mf, mt) =>
      mp4Boxes(b, mf, mt).collect { case ("trak", tf, tt) =>
        parseTrak(b, tf, tt)
      }.collectFirst { case Some(t) => t }
    }
  }

  private def parseTrak(b: Array[Byte], from: Int, to: Int)
      : Option[(Int, Int, String, IndexedSeq[(Int, Int)])] = {
    var handler = ""
    var fmt = ""
    var w = -1; var h = -1; var depth = -1
    var sizes: IndexedSeq[Int] = IndexedSeq.empty
    var chunkOffs: IndexedSeq[Int] = IndexedSeq.empty
    var stsc: IndexedSeq[(Int, Int)] = IndexedSeq.empty // (firstChunk, perChunk)
    def walk(from: Int, to: Int): Unit =
      mp4Boxes(b, from, to).foreach {
        case ("mdia", f, t) => walk(f, t)
        case ("minf", f, t) => walk(f, t)
        case ("stbl", f, t) => walk(f, t)
        case ("hdlr", f, t) if t - f >= 12 =>
          handler = fourcc(b, f + 8)
        case ("stsd", f, t) if t - f >= 16 =>
          val entry = f + 8 // ver/flags + entry_count
          if (entry + 86 <= t) {
            fmt = fourcc(b, entry + 4)
            w = be16(b, entry + 32); h = be16(b, entry + 34)
            depth = be16(b, entry + 82)
          }
        case ("stsz", f, t) if t - f >= 12 =>
          val fixed = be32(b, f + 4)
          val n = be32(b, f + 8)
          if (n >= 0 && (fixed != 0 || f + 12 + 4L * n <= t))
            sizes = (0 until n).map(i =>
              if (fixed != 0) fixed else be32(b, f + 12 + 4 * i))
        case ("stco", f, t) if t - f >= 8 =>
          val n = be32(b, f + 4)
          if (n >= 0 && f + 8 + 4L * n <= t)
            chunkOffs = (0 until n).map(i => be32(b, f + 8 + 4 * i))
        case ("stsc", f, t) if t - f >= 8 =>
          val n = be32(b, f + 4)
          if (n >= 0 && f + 8 + 12L * n <= t)
            stsc = (0 until n).map(i =>
              (be32(b, f + 8 + 12 * i), be32(b, f + 12 + 12 * i)))
        case _ => ()
      }
    walk(from, to)
    // `raw ` must be 24-bit; a registered plug-in codec owns its own
    // pixel format, so only the fourcc gate applies to it
    val decodable = fmt == "raw " && depth == 24 ||
      videoCodecs.containsKey(fmt)
    if (handler != "vide" || !decodable || w <= 0 ||
        h <= 0 || sizes.isEmpty || chunkOffs.isEmpty || stsc.isEmpty)
      return None
    // stsc chunk-run expansion: entry i applies from its firstChunk up
    // to the next entry's firstChunk (1-based); samples are laid out
    // back-to-back inside each chunk
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var sample = 0
    var ci = 0
    while (ci < chunkOffs.length && sample < sizes.length) {
      val chunkNo = ci + 1
      val perChunk = stsc.takeWhile(_._1 <= chunkNo).lastOption
        .map(_._2).getOrElse(0)
      if (perChunk <= 0) return None // malformed table
      var off = chunkOffs(ci)
      var s = 0
      while (s < perChunk && sample < sizes.length) {
        val sz = sizes(sample)
        if (off < 0 || sz < 0 || off.toLong + sz > b.length) return None
        frames += ((off, sz))
        off += sz; s += 1; sample += 1
      }
      ci += 1
    }
    if (sample < sizes.length) None // stco ran out before the samples
    else Some((w, h, fmt, frames.toIndexedSeq))
  }

  /** Exact channel means of one packed top-down RGB24 MP4 `raw ` sample
    * (no row padding — MP4 samples carry no DIB stride). */
  private def rgb24Means(b: Array[Byte], off: Int, size: Int,
                         w: Int, h: Int): Option[(Int, Int, Int)] = {
    val need = w * h * 3
    if (size < need || off + need > b.length) return None
    var (sr, sg, sb) = (0L, 0L, 0L)
    var p = off
    val end = off + need
    while (p < end) {
      sr += b(p) & 0xFF; sg += b(p + 1) & 0xFF; sb += b(p + 2) & 0xFF
      p += 3
    }
    val n = w.toLong * h
    Some(((sr / n).toInt, (sg / n).toInt, (sb / n).toInt))
  }

  /** Exact channel means of one uncompressed RGB24 DIB frame (bottom-up
    * rows, 4-byte-aligned stride, BGR byte order — the DIB contract). */
  private def dibMeans(b: Array[Byte], off: Int, size: Int,
                       w: Int, h: Int): Option[(Int, Int, Int)] = {
    val stride = (w * 3 + 3) & ~3
    if (size < stride * h) return None
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var p = off + y * stride
      var x = 0
      while (x < w) {
        sb += b(p) & 0xFF; sg += b(p + 1) & 0xFF; sr += b(p + 2) & 0xFF
        p += 3; x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Some(((sr / n).toInt, (sg / n).toInt, (sb / n).toInt))
  }

  /** Exact channel means of one Motion-JPEG frame: the chunk payload is
    * a standalone JPEG image decoded through the SAME `javax.imageio`
    * path the image operators use — a real compressed-codec decode.
    * Dims are taken from the decoded image (per-frame ground truth);
    * a frame that fails JPEG decode yields null stats, not a crash. */
  private def mjpegMeans(b: Array[Byte], off: Int,
                         size: Int): Option[(Int, Int, Int, Int, Int)] = {
    if (off < 0 || size <= 0 || off.toLong + size > b.length) return None
    decodeImage(java.util.Arrays.copyOfRange(b, off, off + size))
      .map { img =>
        val (_, mr, mg, mb) = imageStats(img)
        (img.getWidth, img.getHeight, mr, mg, mb)
      }
  }

  /** REAL frame sampling: parse the container — RIFF/AVI ([[parseAvi]])
    * or ISO-BMFF MP4 ([[parseMp4]]) — pick `k` evenly-spaced frames
    * (`j * (n-1) / (k-1)`), and emit exact per-frame stats from the
    * pixels: uncompressed DIB BGR bottom-up for AVI `dib`, packed RGB
    * top-down for MP4 `raw ` samples, and a full `javax.imageio` JPEG
    * decode per frame for AVI Motion-JPEG (`mjpg`) — the one compressed
    * video codec the stock JDK decodes end to end. Payloads that parse
    * as neither emit one null-stat row (same totality contract as
    * [[decodeAudio]]). Other compressed codecs (H.264 in either
    * container) are where a production JNI codec plugs into this SAME
    * partition host — the container walks and sampling do not change. */
  def sampleVideoFrames(media: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(videoFrameSchema)
    media.select("id", "media").mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getAs[Long]("id")
        val bytes = r.getAs[Array[Byte]]("media")
        val parsed = parseAvi(bytes)
          .map { case (w, h, fr, codec) => (w, h, fr, codec) }
          .orElse(parseMp4(bytes).map { case (w, h, fmt, fr) =>
            (w, h, fr, if (fmt == "raw ") "raw" else fmt)
          })
        parsed match {
          case Some((w, h, frames, codec)) =>
            val n = frames.length
            val picks =
              if (k == 1) Seq(0)
              else (0 until k).map(j => j * (n - 1) / (k - 1)).distinct
            picks.iterator.map { f =>
              val (off, size) = frames(f)
              codec match {
                case "mjpg" =>
                  mjpegMeans(bytes, off, size) match {
                    case Some((fw, fh, mr, mg, mb)) =>
                      Row(id, n, f, fw, fh, mr, mg, mb)
                    case None => Row(id, n, f, w, h, null, null, null)
                  }
                case "dib" | "raw" =>
                  val means =
                    if (codec == "dib") dibMeans(bytes, off, size, w, h)
                    else rgb24Means(bytes, off, size, w, h)
                  means match {
                    case Some((mr, mg, mb)) =>
                      Row(id, n, f, w, h, mr, mg, mb)
                    case None => Row(id, n, f, w, h, null, null, null)
                  }
                case plug =>
                  // registered plug-in codec (the JNI seam): a track
                  // with this fourcc only parses when a decoder is
                  // registered, so the lookup cannot be null here —
                  // but a decoder may still reject one sample
                  Option(videoCodecs.get(plug))
                    .flatMap(_(bytes, off, size)) match {
                    case Some((fw, fh, mr, mg, mb)) =>
                      Row(id, n, f, fw, fh, mr, mg, mb)
                    case None => Row(id, n, f, w, h, null, null, null)
                  }
              }
            }
          case None =>
            Iterator.single(Row(id, null, null, null, null, null, null,
              null))
        }
      }
    }(enc)
  }

  /** Per-id synthesized AVI (gate fixture, same philosophy as
    * [[synthesizeImages]]): `3 + id % 5` uncompressed RGB24 frames of
    * `16 + id % 16` × `8 + id % 8`, frame `f` solid-colored
    * `((id*31 + f*17) % 256, (id*57 + f*23) % 256, (id*91 + f*29) % 256)`
    * — every sampled-frame stat is pure integer arithmetic on
    * (id, frame_idx) while the bytes form a spec-shaped container
    * (RIFF/AVI : hdrl(avih, strl(strh, strf)) + movi with `00db`
    * chunks) that [[parseAvi]] must walk for real. */
  def synthesizeAvi(df: DataFrame, idCol: String): DataFrame = {
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = 16 + (id % 16).toInt
        val h = 8 + (id % 8).toInt
        val n = 3 + (id % 5).toInt
        val stride = (w * 3 + 3) & ~3
        val frameSize = stride * h
        val out = new ByteArrayOutputStream()
        def w32(v: Int): Unit = {
          out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
          out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
        }
        def w16(v: Int): Unit = {
          out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
        }
        def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
        val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
        val moviSize = 4 + n * (8 + frameSize)
        cc("RIFF"); w32(4 + (8 + hdrlSize) + (8 + moviSize)); cc("AVI ")
        cc("LIST"); w32(hdrlSize); cc("hdrl")
        cc("avih"); w32(56)
        w32(40000); w32(0); w32(0); w32(0) // usec/frame, maxBps, pad, flags
        w32(n); w32(0); w32(1); w32(frameSize) // totalFrames..bufSize
        w32(w); w32(h); w32(0); w32(0); w32(0); w32(0) // dims + reserved
        cc("LIST"); w32(4 + (8 + 56) + (8 + 40)); cc("strl")
        cc("strh"); w32(56)
        cc("vids"); cc("DIB ")
        w32(0); w32(0); w32(0) // flags, prio+lang, initialFrames
        w32(1); w32(25); w32(0); w32(n) // scale, rate, start, length
        w32(frameSize); w32(-1); w32(0) // bufSize, quality, sampleSize
        w16(0); w16(0); w16(w); w16(h) // rcFrame
        cc("strf"); w32(40) // BITMAPINFOHEADER
        w32(40); w32(w); w32(h); w16(1); w16(24)
        w32(0); w32(frameSize); w32(0); w32(0); w32(0); w32(0)
        cc("LIST"); w32(moviSize); cc("movi")
        var f = 0
        while (f < n) {
          cc("00db"); w32(frameSize)
          val br = ((id * 31 + f * 17) % 256).toInt
          val bg = ((id * 57 + f * 23) % 256).toInt
          val bb = ((id * 91 + f * 29) % 256).toInt
          val row = new Array[Byte](stride) // BGR + zero pad
          var x = 0
          while (x < w) {
            row(3 * x) = bb.toByte; row(3 * x + 1) = bg.toByte
            row(3 * x + 2) = br.toByte
            x += 1
          }
          var y = 0
          while (y < h) { out.write(row); y += 1 }
          f += 1
        }
        val bytes = out.toByteArray
        Row(id, bytes, Row("video/avi", bytes.length.toLong))
      }
    }(enc)
  }

  /** Per-thread JPEG writer (r16 optimization, the [[jpegReaderTl]]
    * twin): constructing + disposing a writer per FRAME was the
    * dominant cost of Motion-JPEG synthesis (thousands of tiny
    * frames). `setOutput` fully re-targets a writer between uses and
    * the encoder is deterministic for identical input + params, so
    * the emitted bytes are unchanged; an encode failure discards the
    * thread's instance. */
  @transient private lazy val jpegWriterTl
      : ThreadLocal[javax.imageio.ImageWriter] =
    ThreadLocal.withInitial(() =>
      ImageIO.getImageWritersByFormatName("jpeg").next())

  /** JPEG-encode with an explicit quality (the plain `ImageIO.write`
    * has no quality control; Motion-JPEG synthesis needs q = 1.0 so
    * the DC-only quantization of solid frames stays exact). */
  private def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    imageIoInit
    val writer = jpegWriterTl.get()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } catch {
      case NonFatal(e) =>
        try writer.dispose() catch { case NonFatal(_) => }
        jpegWriterTl.remove(); throw e
    } finally ios.close()
    out.toByteArray
  }

  /** Per-id synthesized Motion-JPEG AVI (gate fixture): same container
    * skeleton and dims/frame-count arithmetic as [[synthesizeAvi]], but
    * the stream is `MJPG` (strh fourcc + strf biCompression) and each
    * `00dc` chunk is a REAL standalone JPEG — encoded at quality 1.0 —
    * of a solid GRAY frame, `gray = (id*31 + f*17) % 256` on all three
    * channels. Gray is the load-bearing choice: for r = g = b the JFIF
    * RGB→YCbCr transform gives Y = gray exactly (the luma weights sum
    * to 1) and Cb = Cr = 128, chroma subsampling of a constant is that
    * constant, and at quality 1.0 the DC-only quantization is exact —
    * so the decode side recovers the EXACT gray (verified exhaustively
    * over all 256 grays in MultimodalCodecSpec), which makes a real
    * compressed-codec decode replayable by pure id arithmetic in
    * DuckDB. Arbitrary colors round-trip only to ±1 (measured), which
    * is why the fixture is gray, not the DIB fixture's RGB triple. */
  def synthesizeMjpegAvi(df: DataFrame, idCol: String): DataFrame = {
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = 16 + (id % 16).toInt
        val h = 8 + (id % 8).toInt
        val n = 3 + (id % 5).toInt
        // one image reused across the row's frames, filled through the
        // raster's backing byte array — for a solid gray all three
        // interleaved channels are the same byte, so a single fill
        // replaces the per-pixel setRGB loop (identical pixel content,
        // identical JPEG bytes; r16 optimization)
        val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
        val data = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        val jpegs = (0 until n).map { f =>
          val gray = ((id * 31 + f * 17) % 256).toInt
          java.util.Arrays.fill(data, gray.toByte)
          encodeJpeg(img, 1.0f)
        }
        val out = new ByteArrayOutputStream()
        def w32(v: Int): Unit = {
          out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
          out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
        }
        def w16(v: Int): Unit = {
          out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
        }
        def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
        def pad(sz: Int): Int = sz + (sz & 1) // RIFF even-padding
        val maxFrame = jpegs.map(_.length).max
        val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
        val moviSize = 4 + jpegs.map(j => 8 + pad(j.length)).sum
        cc("RIFF"); w32(4 + (8 + hdrlSize) + (8 + moviSize)); cc("AVI ")
        cc("LIST"); w32(hdrlSize); cc("hdrl")
        cc("avih"); w32(56)
        w32(40000); w32(0); w32(0); w32(0)
        w32(n); w32(0); w32(1); w32(maxFrame)
        w32(w); w32(h); w32(0); w32(0); w32(0); w32(0)
        cc("LIST"); w32(4 + (8 + 56) + (8 + 40)); cc("strl")
        cc("strh"); w32(56)
        cc("vids"); cc("MJPG")
        w32(0); w32(0); w32(0)
        w32(1); w32(25); w32(0); w32(n)
        w32(maxFrame); w32(-1); w32(0)
        w16(0); w16(0); w16(w); w16(h)
        cc("strf"); w32(40) // BITMAPINFOHEADER, biCompression = 'MJPG'
        w32(40); w32(w); w32(h); w16(1); w16(24)
        cc("MJPG"); w32(w * h * 3); w32(0); w32(0); w32(0); w32(0)
        cc("LIST"); w32(moviSize); cc("movi")
        jpegs.foreach { j =>
          cc("00dc"); w32(j.length)
          out.write(j)
          if ((j.length & 1) == 1) out.write(0) // even-pad odd chunks
        }
        val bytes = out.toByteArray
        Row(id, bytes, Row("video/avi", bytes.length.toLong))
      }
    }(enc)
  }

  /** Per-id synthesized ISO-BMFF MP4 (gate fixture, same
    * id-arithmetic-only discipline as [[synthesizeAvi]]): `3 + id % 6`
    * packed top-down RGB24 `raw ` frames of `12 + id % 20` × `6 + id %
    * 10`, frame `f` solid-colored `((id*37 + f*19) % 256, (id*53 +
    * f*29) % 256, (id*89 + f*31) % 256)` — every sampled-frame stat is
    * pure integer arithmetic on (id, frame_idx) while the bytes form a
    * spec-shaped container the [[parseMp4]] walk must traverse for
    * real: ftyp + mdat + moov{mvhd, trak{tkhd, mdia{mdhd, hdlr(vide),
    * minf{vmhd, dinf{dref{url }}, stbl{stsd('raw ', depth 24), stts,
    * stsc, stsz, stco}}}}}, with TWO samples per chunk (odd counts get
    * a short tail chunk) so the stsc chunk-run expansion is exercised,
    * not just a 1:1 shortcut. */
  def synthesizeMp4(df: DataFrame, idCol: String,
                    sampleEntry: String = "raw "): DataFrame = {
    require(sampleEntry.length == 4,
      s"sample entry fourcc must be 4 chars: '$sampleEntry'")
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = 12 + (id % 20).toInt
        val h = 6 + (id % 10).toInt
        val n = 3 + (id % 6).toInt
        val frameSize = w * h * 3
        val nChunks = (n + 1) / 2
        val out = new ByteArrayOutputStream()
        def b32(v: Int): Unit = {
          out.write((v >> 24) & 0xFF); out.write((v >> 16) & 0xFF)
          out.write((v >> 8) & 0xFF); out.write(v & 0xFF)
        }
        def b16(v: Int): Unit = {
          out.write((v >> 8) & 0xFF); out.write(v & 0xFF)
        }
        def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
        def zeros(k: Int): Unit = (0 until k).foreach(_ => out.write(0))
        // ---- ftyp (20) then mdat: frame i starts at 28 + i*frameSize
        b32(20); cc("ftyp"); cc("isom"); b32(0); cc("isom")
        val mdatPayloadAt = 20 + 8
        b32(8 + n * frameSize); cc("mdat")
        var f = 0
        while (f < n) {
          val fr = ((id * 37 + f * 19) % 256).toInt
          val fg = ((id * 53 + f * 29) % 256).toInt
          val fb = ((id * 89 + f * 31) % 256).toInt
          var p = 0
          while (p < w * h) {
            out.write(fr); out.write(fg); out.write(fb)
            p += 1
          }
          f += 1
        }
        // ---- moov (sizes computed leaf-first)
        val stsdSz = 16 + 86
        val sttsSz = 24
        val stscSz = 16 + 12 * (if (n % 2 == 1) 2 else 1)
        val stszSz = 20 + 4 * n
        val stcoSz = 16 + 4 * nChunks
        val stblSz = 8 + stsdSz + sttsSz + stscSz + stszSz + stcoSz
        val vmhdSz = 20
        val dinfSz = 8 + (8 + 8 + 12) // dinf{dref{url }}
        val minfSz = 8 + vmhdSz + dinfSz + stblSz
        val mdhdSz = 32
        val hdlrSz = 33
        val mdiaSz = 8 + mdhdSz + hdlrSz + minfSz
        val tkhdSz = 92
        val trakSz = 8 + tkhdSz + mdiaSz
        val mvhdSz = 108
        b32(8 + mvhdSz + trakSz); cc("moov")
        b32(mvhdSz); cc("mvhd"); b32(0) // version+flags
        b32(0); b32(0); b32(1000); b32(n * 40) // times, timescale, duration
        b32(0x00010000); b16(0x0100); zeros(10) // rate, volume, reserved
        b32(0x00010000); b32(0); b32(0) // identity matrix rows
        b32(0); b32(0x00010000); b32(0)
        b32(0); b32(0); b32(0x40000000)
        zeros(24); b32(2) // pre_defined, next track id
        b32(trakSz); cc("trak")
        b32(tkhdSz); cc("tkhd"); b32(7) // version 0, flags enabled
        b32(0); b32(0); b32(1); b32(0); b32(n * 40) // times, id, duration
        zeros(8); b16(0); b16(0); b16(0); b16(0) // layer..reserved
        b32(0x00010000); b32(0); b32(0) // identity matrix
        b32(0); b32(0x00010000); b32(0)
        b32(0); b32(0); b32(0x40000000)
        b32(w << 16); b32(h << 16) // 16.16 fixed dims
        b32(mdiaSz); cc("mdia")
        b32(mdhdSz); cc("mdhd"); b32(0)
        b32(0); b32(0); b32(1000); b32(n * 40)
        b16(0x55C4); b16(0) // language 'und', pre_defined
        b32(hdlrSz); cc("hdlr"); b32(0)
        b32(0); cc("vide"); zeros(12); out.write(0) // empty name
        b32(minfSz); cc("minf")
        b32(vmhdSz); cc("vmhd"); b32(1); b16(0); b16(0); b16(0); b16(0)
        b32(dinfSz); cc("dinf")
        b32(8 + 8 + 12); cc("dref"); b32(0); b32(1)
        b32(12); cc("url "); b32(1) // self-contained
        b32(stblSz); cc("stbl")
        b32(stsdSz); cc("stsd"); b32(0); b32(1)
        b32(86); cc(sampleEntry); zeros(6); b16(1) // sample entry header
        b16(0); b16(0); zeros(12) // pre_defined, reserved, pre_defined
        b16(w); b16(h)
        b32(0x00480000); b32(0x00480000) // 72 dpi
        b32(0); b16(1); zeros(32) // data size, frame count, compressor
        b16(24); b16(0xFFFF) // depth, pre_defined -1
        b32(sttsSz); cc("stts"); b32(0); b32(1); b32(n); b32(40)
        b32(stscSz); cc("stsc"); b32(0)
        if (n % 2 == 1) {
          b32(2); b32(1); b32(2); b32(1) // chunks 1.. hold 2 samples,
          b32(nChunks); b32(1); b32(1)   // the tail chunk holds 1
        } else {
          b32(1); b32(1); b32(2); b32(1)
        }
        b32(stszSz); cc("stsz"); b32(0); b32(0); b32(n)
        (0 until n).foreach(_ => b32(frameSize))
        b32(stcoSz); cc("stco"); b32(0); b32(nChunks)
        (0 until nChunks).foreach(c => b32(mdatPayloadAt +
          2 * c * frameSize))
        val bytes = out.toByteArray
        Row(id, bytes, Row("video/mp4", bytes.length.toLong))
      }
    }(enc)
  }

  /** Frame sampling for OPAQUE payloads: slice `n` evenly-spaced byte
    * windows as stand-in frames; emits one row per frame with the frame
    * index. For real AVI containers use [[sampleVideoFrames]], which
    * walks the RIFF structure instead of slicing bytes. */
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

  /** EXR decode output: dims + per-channel means (doubles — EXR is an
    * HDR float format, unlike [[decodedSchema]]'s 8-bit stats). */
  val exrSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  /** Decode OpenEXR payloads through the engine's own scanline codec
    * ([[Exr]] — HALF/FLOAT channels, NONE/RLE/ZIPS/ZIP): dims,
    * channel count, and the means of the R/G/B channels (null when a
    * channel of that name is absent). Non-EXR or unsupported payloads
    * emit one null-stat row (the [[decodeAudio]] totality contract). */
  def decodeExr(media: DataFrame): DataFrame = {
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(exrSchema)
    media.select("id", "media").mapPartitions { it =>
      it.map { r =>
        val id = r.getAs[Long]("id")
        Exr.decode(r.getAs[Array[Byte]]("media")) match {
          case Some(img) =>
            val byName = img.channels.toMap
            def m(n: String) = byName.get(n)
              .map(Double.box).orNull
            Row(id, img.width, img.height, img.channels.length,
              m("R"), m("G"), m("B"))
          case None => Row(id, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Per-id EXR gate fixture: a solid-color `8 + id % 24` ×
    * `4 + id % 12` image with HALF channels B, G, R (alphabetical, the
    * OpenEXR convention) holding `(id*91 % 256, id*57 % 256,
    * id*31 % 256)` — small integers are exact in float16, so the
    * decoded means are pure id arithmetic — cycling through ALL FOUR
    * supported compressions by `id % 4` (NONE, RLE, ZIPS, ZIP), so one
    * gate covers every decode path including the zlib and RLE legs. */
  def synthesizeExr(df: DataFrame, idCol: String): DataFrame = {
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (8 + id % 24).toInt
        val h = (4 + id % 12).toInt
        def plane(v: Long) = Array.fill(w * h)((v % 256).toFloat)
        val bytes = Exr.encode(w, h, Seq(
          "B" -> plane(id * 91), "G" -> plane(id * 57),
          "R" -> plane(id * 31)),
          pixelType = 1, compression = (id % 4).toInt)
        Row(id, bytes, Row("image/exr", bytes.length.toLong))
      }
    }(enc)
  }

  /** Per-id FLAC gate fixture: a centered SAWTOOTH — period
    * `m = 64 + id % 64`, values `(i % m) - m/2`, over `n = 256 + id %
    * 512` mono 16-bit 8 kHz frames — compressed through the engine's
    * own FLAC encoder ([[Flac.encode]]). The ramp makes order-1 fixed
    * residuals constant except at period wraps, so the bitstream is
    * GENUINELY compressed (~4-5x vs raw PCM — a period-2 square wave,
    * by contrast, defeats every fixed predictor; measured in FlacSpec),
    * while every decoded property is replayable in DuckDB by
    * regenerating the integer wave with `generate_series`: peak is the
    * exact max |sample| and the sum of squares stays below 2^53, so
    * RMS is bit-identical double arithmetic on both sides. */
  def synthesizeFlac(df: DataFrame, idCol: String): DataFrame = {
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val m = (64 + id % 64).toInt
        val n = (256 + id % 512).toInt
        val samples = Array.tabulate(n)(i => (i % m) - m / 2)
        val bytes = Flac.encode(samples, 8000)
        Row(id, bytes, Row("audio/flac", bytes.length.toLong))
      }
    }(enc)
  }
}
