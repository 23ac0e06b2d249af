package graft.pipeline

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM FLAC codec (RFC 9639 subset) — the real compressed audio
  * codec the multimodal layer decodes end to end, closing the audio leg
  * of the "compressed codecs are a JNI seam" list the same way the
  * Motion-JPEG path closed video ([[Multimodal.sampleVideoFrames]]).
  * No Spark here: byte-array in, samples out; [[Multimodal.decodeAudio]]
  * hosts it per partition.
  *
  * Decoder coverage: STREAMINFO + arbitrary skipped metadata blocks;
  * frames with fixed or variable blocking; all block-size / sample-rate
  * / sample-size header encodings; CONSTANT, VERBATIM, FIXED (orders
  * 0-4) and LPC (orders 1-32) subframes; 4- and 5-bit partitioned Rice
  * residuals including escape partitions; wasted bits; independent
  * channels plus the left/side, right/side and mid/side stereo
  * decorrelations; CRC-8 (header) and CRC-16 (frame) verified — a
  * mismatch rejects the stream rather than emitting garbage.
  *
  * Encoder coverage (fixture + round-trip testing): mono, 16-bit,
  * CONSTANT or best-of-FIXED(0-4) per block with single-partition Rice
  * — a genuine compressing encoder (the sawtooth gate fixture
  * compresses ~4-5x, a linear ramp ~6x; a period-2 square wave defeats
  * every fixed predictor and stays ~1:1 — measured in FlacSpec), not a
  * VERBATIM wrapper. The reference engine has no media layer at all;
  * this is the Spark engine's own answer, like the AVI/MP4 walks.
  */
object Flac {

  /** Stream-level facts from STREAMINFO. */
  final case class Info(sampleRate: Int, channels: Int,
                        bitsPerSample: Int, totalSamples: Long)

  // ---- CRCs (MSB-first, init 0) ----
  private[pipeline] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF
        else (crc << 1) & 0xFF
        k += 1
      }
      i += 1
    }
    crc
  }

  /** Indexed-access twins for the encoder: snapshotting the whole
    * accumulated stream buffer per frame (`buf.toArray`) made encoding
    * O(frames x streamLength) — quadratic for long inputs (advice
    * r13). ArrayBuffer apply() is O(1), so these are one pass over the
    * frame's own bytes only. */
  private[pipeline] def crc8(b: ArrayBuffer[Byte], from: Int,
                             until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF
        else (crc << 1) & 0xFF
        k += 1
      }
      i += 1
    }
    crc
  }

  private[pipeline] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
        else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  private[pipeline] def crc16(b: ArrayBuffer[Byte], from: Int,
                              until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
        else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  /** MSB-first bit reader over a byte array. Reads past the end throw
    * [[IndexOutOfBoundsException]], which [[decode]] turns into None —
    * torn payloads reject rather than crash the batch. */
  private final class BitReader(val b: Array[Byte]) {
    var bytePos = 0
    private var bitPos = 0 // 0..7, next bit within b(bytePos)

    def aligned: Boolean = bitPos == 0
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }

    def readBit(): Int = {
      val v = (b(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }

    def readBits(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 1) | readBit(); k += 1 }
      v
    }

    /** Signed two's-complement read. */
    def readSigned(n: Int): Long = {
      val u = readBits(n)
      if (n == 0) 0L
      else if ((u & (1L << (n - 1))) != 0) u - (1L << n)
      else u
    }

    /** FLAC unary: n zero bits terminated by a one bit → n. */
    def readUnary(): Int = {
      var n = 0
      while (readBit() == 0) n += 1
      n
    }
  }

  /** MSB-first bit writer; frame CRCs are computed over the byte-aligned
    * ranges the spec defines, so the writer exposes its buffer. */
  private[pipeline] final class BitWriter {
    val buf = new ArrayBuffer[Byte](1 << 12)
    private var cur = 0
    private var nBits = 0

    def writeBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nBits += 1
      if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
    }

    def writeBits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { writeBit(((v >> k) & 1L).toInt); k -= 1 }
    }

    /** FLAC unary: n zero bits then a one. */
    def writeUnary(n: Int): Unit = {
      var k = 0
      while (k < n) { writeBit(0); k += 1 }
      writeBit(1)
    }

    def align(): Unit = while (nBits != 0) writeBit(0)
    def size: Int = { require(nBits == 0, "unaligned"); buf.length }
    def toBytes: Array[Byte] = { align(); buf.toArray }
  }

  /** UTF-8-style coded number (the frame/sample number encoding). */
  private def readCodedNumber(r: BitReader): Long = {
    val first = r.readBits(8).toInt
    if ((first & 0x80) == 0) return first.toLong
    var n = 0
    var mask = 0x40
    while ((first & mask) != 0) { n += 1; mask >>= 1 }
    // n continuation bytes; n in 1..6 (7-byte max for sample numbers)
    if (n < 1 || n > 6) throw new IllegalArgumentException("bad utf8")
    var v = (first & (mask - 1)).toLong
    var k = 0
    while (k < n) {
      val c = r.readBits(8).toInt
      if ((c & 0xC0) != 0x80) throw new IllegalArgumentException("bad utf8")
      v = (v << 6) | (c & 0x3F)
      k += 1
    }
    v
  }

  private def writeCodedNumber(w: BitWriter, value: Long): Unit = {
    if (value < 0x80) { w.writeBits(value, 8); return }
    // count payload bits → continuation bytes needed
    var n = 1
    while (n <= 6 && value >= (1L << (n * 6 + (6 - n)))) n += 1
    val lead = (0xFF << (7 - n)) & 0xFF
    w.writeBits(lead | (value >> (6 * n)), 8)
    var k = n - 1
    while (k >= 0) {
      w.writeBits(0x80 | ((value >> (6 * k)) & 0x3F), 8)
      k -= 1
    }
  }

  // fixed-predictor coefficients by order (x[i] = e[i] + sum c_j x[i-1-j])
  private val FixedCoefs: Array[Array[Long]] = Array(
    Array.empty, Array(1L), Array(2L, -1L), Array(3L, -3L, 1L),
    Array(4L, -6L, 4L, -1L))

  /** Decode rice/escape residuals into `out[order until blockSize]`. */
  private def readResidual(r: BitReader, blockSize: Int, order: Int,
                           out: Array[Long]): Unit = {
    val method = r.readBits(2).toInt
    if (method > 1) throw new IllegalArgumentException("bad residual method")
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    val po = r.readBits(4).toInt
    val parts = 1 << po
    if (blockSize % parts != 0 || (blockSize >> po) <= order && parts > 1)
      throw new IllegalArgumentException("bad partition order")
    var idx = order
    var p = 0
    while (p < parts) {
      val cnt = (blockSize >> po) - (if (p == 0) order else 0)
      if (cnt < 0) throw new IllegalArgumentException("bad partition")
      val param = r.readBits(pBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < cnt) { out(idx) = r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < cnt) {
          val q = r.readUnary().toLong
          val u = (q << param) | r.readBits(param)
          out(idx) = (u >>> 1) ^ -(u & 1L) // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  /** One channel's subframe → samples (before stereo undecorrelation). */
  private def readSubframe(r: BitReader, blockSize: Int,
                           bps: Int): Array[Long] = {
    if (r.readBit() != 0) throw new IllegalArgumentException("pad bit")
    val tpe = r.readBits(6).toInt
    var wasted = 0
    if (r.readBit() == 1) wasted = r.readUnary() + 1
    val eff = bps - wasted
    val out = new Array[Long](blockSize)
    if (tpe == 0) { // CONSTANT
      val v = r.readSigned(eff)
      java.util.Arrays.fill(out, v)
    } else if (tpe == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { out(i) = r.readSigned(eff); i += 1 }
    } else if (tpe >= 8 && tpe <= 12) { // FIXED order 0-4
      val order = tpe - 8
      var i = 0
      while (i < order) { out(i) = r.readSigned(eff); i += 1 }
      readResidual(r, blockSize, order, out)
      val c = FixedCoefs(order)
      i = order
      while (i < blockSize) {
        var acc = out(i)
        var j = 0
        while (j < order) { acc += c(j) * out(i - 1 - j); j += 1 }
        out(i) = acc
        i += 1
      }
    } else if (tpe >= 32) { // LPC order 1-32
      val order = tpe - 31
      var i = 0
      while (i < order) { out(i) = r.readSigned(eff); i += 1 }
      val precision = r.readBits(4).toInt + 1
      if (precision == 16) throw new IllegalArgumentException("bad qlp")
      val shift = r.readSigned(5).toInt
      if (shift < 0) throw new IllegalArgumentException("negative shift")
      val coefs = new Array[Long](order)
      var j = 0
      while (j < order) { coefs(j) = r.readSigned(precision); j += 1 }
      readResidual(r, blockSize, order, out)
      i = order
      while (i < blockSize) {
        var acc = 0L
        j = 0
        while (j < order) { acc += coefs(j) * out(i - 1 - j); j += 1 }
        out(i) += acc >> shift
        i += 1
      }
    } else throw new IllegalArgumentException(s"reserved subframe $tpe")
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }
    out
  }

  private val BlockSizeTable = Array(0, 192, 576, 1152, 2304, 4608,
    -8, -16, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
  private val RateTable = Array(0, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000, -8, -16, -160, -1)
  private val SizeTable = Array(0, 8, 12, -1, 16, 20, 24, 32)

  /** Decode a whole FLAC stream → (info, per-channel interleaved
    * samples). None for anything that is not a parseable FLAC stream
    * (wrong magic, torn bytes, CRC mismatch, reserved encodings). */
  def decode(bytes: Array[Byte]): Option[(Info, Array[Int])] = {
    try {
      if (bytes.length < 42 || bytes(0) != 'f' || bytes(1) != 'L' ||
        bytes(2) != 'a' || bytes(3) != 'C') return None
      val r = new BitReader(bytes)
      r.bytePos = 4
      // ---- metadata blocks: STREAMINFO first (spec), rest skipped ----
      var info: Info = null
      var last = false
      while (!last) {
        val hdr = r.readBits(8).toInt
        last = (hdr & 0x80) != 0
        val tpe = hdr & 0x7F
        val len = r.readBits(24).toInt
        if (tpe == 0) {
          if (len != 34) return None
          r.readBits(16); r.readBits(16) // min/max blocksize
          r.readBits(24); r.readBits(24) // min/max framesize
          val rate = r.readBits(20).toInt
          val ch = r.readBits(3).toInt + 1
          val bps = r.readBits(5).toInt + 1
          val total = r.readBits(36)
          var i = 0
          while (i < 16) { r.readBits(8); i += 1 } // md5
          info = Info(rate, ch, bps, total)
        } else {
          if (tpe == 127) return None // invalid block type
          r.bytePos += len
          if (r.bytePos > bytes.length) return None
        }
      }
      if (info == null || info.sampleRate == 0) return None
      // Capacity is a HINT only (ArrayBuffer grows on demand): never
      // size it from untrusted header fields — this decoder is hosted
      // on arbitrary corpus payloads, and a crafted STREAMINFO claiming
      // 2^36 samples x 8 channels would force a ~1 GB allocation before
      // any frame parses (advice r13). Honest streams also can't carry
      // more samples than ~8x their byte length, so bound by both.
      val out = new ArrayBuffer[Int](
        math.min(math.min(
          math.max(info.totalSamples, 0L) * info.channels,
          bytes.length.toLong * 8L), 1L << 20).toInt)
      // ---- frames until the stream ends ----
      while (r.bytePos < bytes.length) {
        val frameStart = r.bytePos
        if (r.readBits(14) != 0x3FFE)
          throw new IllegalArgumentException("bad sync")
        if (r.readBit() != 0) throw new IllegalArgumentException("rsvd")
        r.readBit() // blocking strategy (number semantics only)
        val bsCode = r.readBits(4).toInt
        val rateCode = r.readBits(4).toInt
        val chanAsn = r.readBits(4).toInt
        val sizeCode = r.readBits(3).toInt
        if (r.readBit() != 0) throw new IllegalArgumentException("rsvd2")
        readCodedNumber(r)
        val blockSize = BlockSizeTable(bsCode) match {
          case 0 => throw new IllegalArgumentException("reserved bs")
          case -8 => r.readBits(8).toInt + 1
          case -16 => r.readBits(16).toInt + 1
          case v => v
        }
        RateTable(rateCode) match {
          case -8 => r.readBits(8)
          case -16 => r.readBits(16)
          case -160 => r.readBits(16)
          case -1 => throw new IllegalArgumentException("invalid rate")
          case _ => ()
        }
        val bps = SizeTable(sizeCode) match {
          case 0 => info.bitsPerSample
          case -1 => throw new IllegalArgumentException("reserved size")
          case v => v
        }
        val headerEnd = r.bytePos
        val wantCrc8 = r.readBits(8).toInt
        if (crc8(bytes, frameStart, headerEnd) != wantCrc8) return None
        // ---- subframes (stereo decorrelation: side gets bps+1) ----
        val channels: Array[Array[Long]] = chanAsn match {
          case a if a <= 7 =>
            Array.tabulate(a + 1)(_ => readSubframe(r, blockSize, bps))
          case 8 => // left/side
            val l = readSubframe(r, blockSize, bps)
            val s = readSubframe(r, blockSize, bps + 1)
            var i = 0
            while (i < blockSize) { s(i) = l(i) - s(i); i += 1 }
            Array(l, s)
          case 9 => // right/side (side first)
            val s = readSubframe(r, blockSize, bps + 1)
            val rr = readSubframe(r, blockSize, bps)
            var i = 0
            while (i < blockSize) { s(i) = rr(i) + s(i); i += 1 }
            Array(s, rr)
          case 10 => // mid/side
            val m = readSubframe(r, blockSize, bps)
            val s = readSubframe(r, blockSize, bps + 1)
            var i = 0
            while (i < blockSize) {
              val mm = (m(i) << 1) | (s(i) & 1L)
              m(i) = (mm + s(i)) >> 1
              s(i) = (mm - s(i)) >> 1
              i += 1
            }
            Array(m, s)
          case _ => throw new IllegalArgumentException("reserved chan")
        }
        val nCh = channels.length
        if (nCh != info.channels)
          throw new IllegalArgumentException("channel count drift")
        r.align()
        val frameEnd = r.bytePos
        val wantCrc16 = r.readBits(16).toInt
        if (crc16(bytes, frameStart, frameEnd) != wantCrc16) return None
        var i = 0
        while (i < blockSize) {
          var c = 0
          while (c < nCh) { out += channels(c)(i).toInt; c += 1 }
          i += 1
        }
      }
      Some((info, out.toArray))
    } catch {
      case _: IndexOutOfBoundsException | _: IllegalArgumentException |
           _: ArithmeticException => None
    }
  }

  // =========================== encoder ===========================

  /** Best single-partition Rice parameter for `u` (zigzagged) values:
    * exact cost scan over the 15 legal 4-bit parameters. */
  private def bestRiceParam(u: Array[Long]): Int = {
    var best = 0
    var bestCost = Long.MaxValue
    var p = 0
    while (p <= 14) {
      var cost = 0L
      var i = 0
      while (i < u.length) { cost += (u(i) >>> p) + 1 + p; i += 1 }
      if (cost < bestCost) { bestCost = cost; best = p }
      p += 1
    }
    best
  }

  private def zigzag(e: Long): Long = (e << 1) ^ (e >> 63)

  /** Encode mono 16-bit PCM as a real FLAC stream: per 4096-sample
    * block, CONSTANT when flat, otherwise the FIXED order (0-4)
    * minimizing total zigzagged residual, single-partition Rice. */
  def encode(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    // the frame header carries the rate verbatim as 16-bit Hz (rate
    // code 13): accepting more would silently truncate it into a
    // stream malformed for spec-conformant decoders (advice r13)
    require(sampleRate > 0 && sampleRate <= 0xFFFF,
      "sampleRate must be 1..65535 (encoded as 16-bit Hz)")
    val w = new BitWriter
    w.writeBits('f', 8); w.writeBits('L', 8)
    w.writeBits('a', 8); w.writeBits('C', 8)
    // STREAMINFO, last metadata block
    w.writeBits(0x80, 8); w.writeBits(34, 24)
    val block = 4096
    val minBs = if (samples.length == 0) block
    else math.min(block, samples.length)
    w.writeBits(minBs.toLong, 16); w.writeBits(block.toLong, 16)
    w.writeBits(0, 24); w.writeBits(0, 24) // frame sizes unknown
    w.writeBits(sampleRate.toLong, 20)
    w.writeBits(0, 3) // channels - 1
    w.writeBits(15, 5) // bps - 1
    w.writeBits(samples.length.toLong, 36)
    var i = 0
    while (i < 16) { w.writeBits(0, 8); i += 1 } // md5 unknown
    var frameNo = 0L
    var off = 0
    while (off < samples.length) {
      val n = math.min(block, samples.length - off)
      val frameStart = w.size
      w.writeBits(0x3FFE, 14) // sync
      w.writeBit(0) // reserved
      w.writeBit(0) // fixed blocking
      w.writeBits(7, 4) // block size: 16-bit at end
      w.writeBits(13, 4) // sample rate: 16-bit Hz at end
      w.writeBits(0, 4) // mono
      w.writeBits(4, 3) // 16-bit samples
      w.writeBit(0) // reserved
      writeCodedNumber(w, frameNo)
      w.writeBits((n - 1).toLong, 16)
      w.writeBits(sampleRate.toLong, 16)
      val headerEnd = w.size
      w.writeBits(crc8(w.buf, frameStart, headerEnd).toLong, 8)
      // ---- subframe ----
      var flat = true
      i = 1
      while (flat && i < n) { flat = samples(off + i) == samples(off); i += 1 }
      if (flat) {
        w.writeBit(0); w.writeBits(0, 6); w.writeBit(0) // CONSTANT
        w.writeBits(samples(off).toLong & 0xFFFF, 16)
      } else {
        // best fixed order by total zigzagged residual magnitude
        var bestOrder = 0
        var bestSum = Long.MaxValue
        var o = 0
        while (o <= math.min(4, n - 1)) {
          val c = FixedCoefs(o)
          var sum = 0L
          i = o
          while (i < n && sum >= 0) {
            var e = samples(off + i).toLong
            var j = 0
            while (j < o) { e -= c(j) * samples(off + i - 1 - j); j += 1 }
            sum += math.abs(e)
            i += 1
          }
          // sum < 0 = the overflow sentinel from the loop guard above
          if (sum >= 0 && sum < bestSum) { bestSum = sum; bestOrder = o }
          o += 1
        }
        val c = FixedCoefs(bestOrder)
        val u = new Array[Long](n - bestOrder)
        i = bestOrder
        while (i < n) {
          var e = samples(off + i).toLong
          var j = 0
          while (j < bestOrder) {
            e -= c(j) * samples(off + i - 1 - j); j += 1
          }
          u(i - bestOrder) = zigzag(e)
          i += 1
        }
        val p = bestRiceParam(u)
        w.writeBit(0); w.writeBits(8L + bestOrder, 6); w.writeBit(0)
        i = 0
        while (i < bestOrder) {
          w.writeBits(samples(off + i).toLong & 0xFFFF, 16); i += 1
        }
        w.writeBits(0, 2) // 4-bit rice
        w.writeBits(0, 4) // partition order 0
        w.writeBits(p.toLong, 4)
        i = 0
        while (i < u.length) {
          w.writeUnary((u(i) >>> p).toInt)
          w.writeBits(u(i) & ((1L << p) - 1), p)
          i += 1
        }
      }
      w.align()
      val frameEnd = w.size
      w.writeBits(crc16(w.buf, frameStart, frameEnd).toLong, 16)
      frameNo += 1
      off += n
    }
    w.toBytes
  }
}
