package graft.pipeline

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM OpenEXR codec (single-part scanline subset) — the HDR image
  * format real vision/render pipelines ship, and the last named codec
  * seam here short of H.264 ([[Flac]] closed audio, Motion-JPEG closed
  * video). No Spark: byte-array in, per-channel stats out;
  * [[Multimodal]] hosts it per partition like the other codecs.
  *
  * Decoder coverage: version-2 single-part scanline streams; the full
  * attribute walk (unknown attributes skipped by their declared size);
  * HALF and FLOAT channels (own float16 conversion — no JDK 20
  * dependency); NONE, RLE, ZIPS (per-scanline zlib) and ZIP (16-line
  * zlib) compression including OpenEXR's delta-predictor + two-half
  * byte-reorder pre-transform and the stored-raw fallback when
  * compression does not shrink a block; increasing line order; the
  * scanline offset table is validated against the chunks it points at.
  * Tiled/deep/multi-part streams, UINT channels and subsampling reject
  * to None (the caller's null-stat contract), as does any torn or
  * inconsistent structure.
  *
  * Encoder coverage (fixture + round-trip testing): HALF or FLOAT
  * channels under any of the four supported compressions — a genuine
  * compressing writer (solid-color planes deflate to a few bytes per
  * block).
  */
object Exr {

  /** Decoded stream: dims + per-channel (name, mean) in file order. */
  final case class Image(width: Int, height: Int,
                         channels: Seq[(String, Double)])

  // ---- float16 (half) conversion — JDK 17 has no Float.float16ToFloat
  private[pipeline] def halfToFloat(h: Int): Float = {
    val sign = (h >> 15) & 1
    val exp = (h >> 10) & 0x1F
    val mant = h & 0x3FF
    val f =
      if (exp == 0) {
        // subnormal: mant * 2^-24
        mant * math.pow(2, -24).toFloat
      } else if (exp == 0x1F) {
        if (mant == 0) Float.PositiveInfinity else Float.NaN
      } else {
        java.lang.Float.intBitsToFloat(
          ((exp - 15 + 127) << 23) | (mant << 13))
      }
    if (sign == 1) -f else f
  }

  private[pipeline] def floatToHalf(f: Float): Int = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val absBits = bits & 0x7FFFFFFF
    if (absBits >= 0x7F800000) { // Inf/NaN
      sign | 0x7C00 | (if (absBits > 0x7F800000) 0x200 else 0)
    } else {
      val exp = (absBits >> 23) - 127 + 15
      val mant = absBits & 0x7FFFFF
      if (exp >= 0x1F) sign | 0x7C00 // overflow -> Inf
      else if (exp <= 0) { // subnormal or zero
        if (exp < -10) sign
        else {
          val m = (mant | 0x800000) >> (1 - exp)
          sign | ((m + 0x1000) >> 13)
        }
      } else {
        // round-half-up on the dropped 13 bits; ADDITION (not OR) so a
        // mantissa overflow carries into the exponent field — and a
        // carry out of exp 30 lands exactly on the Inf encoding
        sign | ((exp << 10) + ((mant + 0x1000) >> 13))
      }
    }
  }

  // ---- OpenEXR ZIP pre-transform (ImfZip shape, public algorithm):
  // compress = interleave-split then delta; decompress = un-delta then
  // re-interleave.
  private def zipPostProcess(buf: Array[Byte]): Array[Byte] = {
    var i = 1
    while (i < buf.length) { // predictor: cumulative sum - 128
      buf(i) = ((buf(i - 1) & 0xFF) + (buf(i) & 0xFF) - 128).toByte
      i += 1
    }
    val out = new Array[Byte](buf.length)
    val half = (buf.length + 1) / 2
    var t1 = 0
    var t2 = half
    var s = 0
    while (s < out.length) {
      out(s) = buf(t1); t1 += 1; s += 1
      if (s < out.length) { out(s) = buf(t2); t2 += 1; s += 1 }
    }
    out
  }

  private def zipPreProcess(raw: Array[Byte]): Array[Byte] = {
    val tmp = new Array[Byte](raw.length)
    val half = (raw.length + 1) / 2
    var t1 = 0
    var t2 = half
    var s = 0
    while (s < raw.length) { // de-interleave into two halves
      tmp(t1) = raw(s); t1 += 1; s += 1
      if (s < raw.length) { tmp(t2) = raw(s); t2 += 1; s += 1 }
    }
    var i = tmp.length - 1
    while (i >= 1) { // delta encode (reverse order, in place)
      tmp(i) = ((tmp(i) & 0xFF) - (tmp(i - 1) & 0xFF) + 128).toByte
      i -= 1
    }
    tmp
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], expect: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expect)
    var off = 0
    while (off < expect && !inf.finished()) {
      val n = inf.inflate(out, off, expect - off)
      if (n == 0 && inf.needsInput())
        throw new IllegalArgumentException("truncated zlib data")
      off += n
    }
    inf.end()
    if (off != expect)
      throw new IllegalArgumentException("zlib size mismatch")
    out
  }

  // ---- OpenEXR RLE (ImfRle shape): signed count byte — negative =
  // -n literals follow, non-negative = repeat next byte n+1 times.
  // Applied to the SAME pre-transformed buffer as ZIP.
  private def rleDecode(data: Array[Byte], expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var i = 0
    var o = 0
    while (i < data.length && o < expect) {
      val n = data(i); i += 1
      if (n < 0) {
        val cnt = -n
        if (i + cnt > data.length || o + cnt > expect)
          throw new IllegalArgumentException("rle literal overrun")
        System.arraycopy(data, i, out, o, cnt)
        i += cnt; o += cnt
      } else {
        val cnt = n + 1
        if (i >= data.length || o + cnt > expect)
          throw new IllegalArgumentException("rle run overrun")
        java.util.Arrays.fill(out, o, o + cnt, data(i))
        i += 1; o += cnt
      }
    }
    if (o != expect) throw new IllegalArgumentException("rle short")
    out
  }

  private def rleEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 16)
    var i = 0
    while (i < data.length) {
      // measure the run at i
      var run = 1
      while (i + run < data.length && data(i + run) == data(i) &&
        run < 128) run += 1
      if (run >= 3) {
        out.write(run - 1); out.write(data(i)); i += run
      } else {
        // literal stretch: until the next >=3 run or 127 bytes
        var lit = 1
        var j = i + 1
        var done = false
        while (!done && j < data.length && lit < 127) {
          var r = 1
          while (j + r < data.length && data(j + r) == data(j) &&
            r < 3) r += 1
          if (r >= 3) done = true
          else { lit += 1; j += 1 }
        }
        out.write(-lit)
        out.write(data, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  // ---- little-endian scalar readers over a byte array ----
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def le64(b: Array[Byte], o: Int): Long =
    (le32(b, o) & 0xFFFFFFFFL) | ((le32(b, o + 4) & 0xFFFFFFFFL) << 32)

  private final case class Channel(name: String, pixelType: Int)

  /** Decode an EXR stream → dims + per-channel means, or None for
    * anything outside the supported envelope (tiled/deep/multi-part,
    * UINT channels, subsampling, unsupported compression, torn data). */
  def decode(bytes: Array[Byte]): Option[Image] = {
    try {
      if (bytes.length < 16 || le32(bytes, 0) != 0x01312F76) return None
      val version = le32(bytes, 4)
      if ((version & 0xFF) != 2) return None
      if ((version & ~0xFF) != 0) return None // tiled/deep/multi-part
      var o = 8
      var channels = Vector.empty[Channel]
      var compression = -1
      var xMin, yMin, xMax, yMax = 0
      var haveDataWindow = false
      def readString(): String = {
        val start = o
        while (bytes(o) != 0) o += 1
        val s = new String(bytes, start, o - start, "US-ASCII")
        o += 1
        s
      }
      // ---- attribute walk; header ends at a lone null byte ----
      while (bytes(o) != 0) {
        val name = readString()
        val tpe = readString()
        val size = le32(bytes, o); o += 4
        if (size < 0 || o + size > bytes.length)
          throw new IllegalArgumentException("torn attribute")
        (name, tpe) match {
          case ("channels", "chlist") =>
            val end = o + size
            while (bytes(o) != 0) {
              val cn = readString()
              val pt = le32(bytes, o)
              val xs = le32(bytes, o + 8)
              val ys = le32(bytes, o + 12)
              o += 16
              if (pt == 0) return None // UINT unsupported
              if (xs != 1 || ys != 1) return None // subsampling
              channels :+= Channel(cn, pt)
            }
            o = end
          case ("compression", "compression") =>
            compression = bytes(o) & 0xFF
            o += size
          case ("dataWindow", "box2i") =>
            xMin = le32(bytes, o); yMin = le32(bytes, o + 4)
            xMax = le32(bytes, o + 8); yMax = le32(bytes, o + 12)
            haveDataWindow = true
            o += size
          case _ => o += size // displayWindow, lineOrder, aspect, ...
        }
      }
      o += 1 // header terminator
      if (channels.isEmpty || !haveDataWindow) return None
      if (!Set(0, 1, 2, 3).contains(compression)) return None
      val width = xMax - xMin + 1
      val height = yMax - yMin + 1
      if (width <= 0 || height <= 0 ||
        width.toLong * height > (1L << 26)) return None
      val linesPerBlock = if (compression == 3) 16 else 1
      val nBlocks = (height + linesPerBlock - 1) / linesPerBlock
      val offsets = (0 until nBlocks).map(i => le64(bytes, o + 8 * i))
      o += 8 * nBlocks
      val bytesPerPixel = channels.map(c => if (c.pixelType == 1) 2 else 4)
      val rowBytes = bytesPerPixel.map(_ * width)
      val sums = new Array[Double](channels.length)
      var block = 0
      while (block < nBlocks) {
        val off = offsets(block).toInt
        if (off < 0 || off + 8 > bytes.length)
          throw new IllegalArgumentException("bad chunk offset")
        val y = le32(bytes, off)
        if (y != yMin + block * linesPerBlock)
          throw new IllegalArgumentException("chunk y mismatch")
        val dataSize = le32(bytes, off + 4)
        if (dataSize < 0 || off + 8 + dataSize > bytes.length)
          throw new IllegalArgumentException("torn chunk")
        val linesHere = math.min(linesPerBlock,
          height - block * linesPerBlock)
        val rawSize = rowBytes.sum * linesHere
        val packed = java.util.Arrays.copyOfRange(bytes, off + 8,
          off + 8 + dataSize)
        val raw = compression match {
          case 0 => packed
          case _ if dataSize >= rawSize => packed // stored raw
          case 1 => zipPostProcess(rleDecode(packed, rawSize))
          case _ => zipPostProcess(inflate(packed, rawSize))
        }
        if (raw.length != rawSize)
          throw new IllegalArgumentException("chunk size mismatch")
        // scanline layout: per line, per channel (file order), the row
        var p = 0
        var line = 0
        while (line < linesHere) {
          var c = 0
          while (c < channels.length) {
            val half = channels(c).pixelType == 1
            var x = 0
            while (x < width) {
              sums(c) +=
                (if (half)
                  halfToFloat((raw(p) & 0xFF) | ((raw(p + 1) & 0xFF) << 8))
                    .toDouble
                else java.lang.Float.intBitsToFloat(le32(raw, p)).toDouble)
              p += bytesPerPixel(c)
              x += 1
            }
            c += 1
          }
          line += 1
        }
        block += 1
      }
      val n = width.toLong * height
      Some(Image(width, height,
        channels.zipWithIndex.map { case (c, i) => c.name -> sums(i) / n }))
    } catch {
      case _: IndexOutOfBoundsException | _: IllegalArgumentException |
           _: NegativeArraySizeException => None
    }
  }

  // =========================== encoder ===========================

  private def w32(out: ArrayBuffer[Byte], v: Int): Unit = {
    out += (v & 0xFF).toByte += ((v >> 8) & 0xFF).toByte +=
      ((v >> 16) & 0xFF).toByte += ((v >> 24) & 0xFF).toByte
  }
  private def w64(out: ArrayBuffer[Byte], v: Long): Unit = {
    w32(out, (v & 0xFFFFFFFFL).toInt); w32(out, (v >>> 32).toInt)
  }
  private def wStr(out: ArrayBuffer[Byte], s: String): Unit = {
    s.foreach(c => out += c.toByte); out += 0
  }
  private def attr(out: ArrayBuffer[Byte], name: String, tpe: String,
                   value: Array[Byte]): Unit = {
    wStr(out, name); wStr(out, tpe); w32(out, value.length)
    out ++= value
  }

  /** Encode planar channel data (channel name → row-major floats) as a
    * single-part scanline EXR. `pixelType`: 1 = HALF, 2 = FLOAT.
    * `compression`: 0 NONE, 1 RLE, 2 ZIPS, 3 ZIP. Channels are written
    * in the given order (OpenEXR convention is alphabetical; the
    * decoder preserves file order, so the spec can exercise any). */
  def encode(width: Int, height: Int,
             channels: Seq[(String, Array[Float])],
             pixelType: Int = 1, compression: Int = 3): Array[Byte] = {
    require(width > 0 && height > 0, "bad dims")
    require(Set(0, 1, 2, 3).contains(compression), "bad compression")
    require(Set(1, 2).contains(pixelType), "bad pixel type")
    require(channels.nonEmpty &&
      channels.forall(_._2.length == width * height), "bad planes")
    val out = new ArrayBuffer[Byte](1 << 12)
    w32(out, 0x01312F76); w32(out, 2)
    val chl = new ArrayBuffer[Byte]()
    channels.foreach { case (n, _) =>
      wStr(chl, n); w32(chl, pixelType)
      w32(chl, 0) // pLinear + reserved
      w32(chl, 1); w32(chl, 1) // sampling
    }
    chl += 0
    attr(out, "channels", "chlist", chl.toArray)
    attr(out, "compression", "compression", Array(compression.toByte))
    val box = new ArrayBuffer[Byte]()
    w32(box, 0); w32(box, 0); w32(box, width - 1); w32(box, height - 1)
    attr(out, "dataWindow", "box2i", box.toArray)
    attr(out, "displayWindow", "box2i", box.toArray)
    attr(out, "lineOrder", "lineOrder", Array(0.toByte))
    attr(out, "pixelAspectRatio", "float",
      { val b = new ArrayBuffer[Byte]()
        w32(b, java.lang.Float.floatToIntBits(1.0f)); b.toArray })
    attr(out, "screenWindowCenter", "v2f", new Array[Byte](8))
    attr(out, "screenWindowWidth", "float",
      { val b = new ArrayBuffer[Byte]()
        w32(b, java.lang.Float.floatToIntBits(1.0f)); b.toArray })
    out += 0 // end of header
    val linesPerBlock = if (compression == 3) 16 else 1
    val nBlocks = (height + linesPerBlock - 1) / linesPerBlock
    val bpp = if (pixelType == 1) 2 else 4
    // build chunks first (offset table needs their positions)
    val chunks = (0 until nBlocks).map { b =>
      val y0 = b * linesPerBlock
      val lines = math.min(linesPerBlock, height - y0)
      val raw = new ArrayBuffer[Byte](width * lines * bpp * channels.size)
      (0 until lines).foreach { dl =>
        channels.foreach { case (_, plane) =>
          (0 until width).foreach { x =>
            val f = plane((y0 + dl) * width + x)
            if (pixelType == 1) {
              val h = floatToHalf(f)
              raw += (h & 0xFF).toByte += ((h >> 8) & 0xFF).toByte
            } else w32(raw, java.lang.Float.floatToIntBits(f))
          }
        }
      }
      val rawArr = raw.toArray
      val packed = compression match {
        case 0 => rawArr
        case 1 => rleEncode(zipPreProcess(rawArr))
        case _ => deflate(zipPreProcess(rawArr))
      }
      // OpenEXR stores the block raw when compression does not shrink it
      val data = if (packed.length >= rawArr.length) rawArr else packed
      (y0, data)
    }
    val tableAt = out.length
    var pos = out.length + 8L * nBlocks
    chunks.foreach { case (_, data) =>
      w64(out, pos)
      pos += 8 + data.length
    }
    require(out.length == tableAt + 8 * nBlocks)
    chunks.foreach { case (y0, data) =>
      w32(out, y0); w32(out, data.length)
      out ++= data
    }
    out.toArray
  }
}
