package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Bit-exact coverage of the engine's pure-JVM FLAC codec ([[Flac]]):
  * encoder round-trips (CONSTANT + best-of-FIXED with Rice residuals),
  * CRC rejection, and hand-built bitstreams for the decoder paths the
  * subset encoder never emits — LPC subframes, escape-coded partitions,
  * wasted bits, multi-partition residuals, and the three stereo
  * decorrelation modes. No Spark involved: the codec is a pure
  * byte-array function hosted by Multimodal's partition iterator.
  */
class FlacSpec extends AnyFunSuite {

  private def roundTrip(samples: Array[Int], rate: Int = 8000): Unit = {
    val bytes = Flac.encode(samples, rate)
    val (info, decoded) = Flac.decode(bytes).getOrElse(
      fail("stream did not decode"))
    assert(info.sampleRate === rate)
    assert(info.channels === 1)
    assert(info.bitsPerSample === 16)
    assert(info.totalSamples === samples.length.toLong)
    assert(decoded.toSeq === samples.toSeq)
  }

  test("round-trip: sawtooth (the gate fixture shape), compressed") {
    // the p90 fixture shape: period-m centered sawtooth
    val m = 80
    val s = Array.tabulate(700)(i => (i % m) - m / 2)
    roundTrip(s)
    // order-1 residuals are constant off the wraps → genuinely
    // compressed, not verbatim-wrapped
    assert(Flac.encode(s, 8000).length < s.length * 2 / 3,
      "sawtooth should compress at least 3x")
  }

  test("compression showcase and adversarial floor") {
    // a linear ramp is the fixed predictors' best case (order-2
    // residuals zero off the period wraps; the wrap spike is what the
    // single-partition Rice pays for — measured ~6x)
    val ramp = Array.tabulate(8000)(i => (i % 4000) - 2000)
    assert(Flac.encode(ramp, 8000).length < ramp.length * 2 / 5,
      "ramp should compress at least 5x")
    // a period-2 square wave defeats every fixed predictor: the stream
    // stays ~1:1 but must still round-trip exactly
    val sq = Array.tabulate(700)(i => if (i % 2 == 0) 12345 else -12345)
    roundTrip(sq)
    assert(Flac.encode(sq, 8000).length < (sq.length * 2 * 11) / 10,
      "square wave should not EXPAND past 1.1x")
  }

  test("round-trip: constant, empty, single-sample, full-range") {
    roundTrip(Array.fill(300)(-777))
    roundTrip(Array.empty[Int])
    roundTrip(Array(32767))
    roundTrip(Array(32767, -32768, 0, -1, 1, -32768, 32767))
  }

  test("round-trip: seeded pseudo-random PCM across multiple frames") {
    val rnd = new scala.util.Random(42)
    // > 4096 samples forces multiple frames and multi-byte coded
    // numbers stay single-byte (frameNo 0..2) — large ids covered below
    val noisy = Array.fill(9000)(rnd.nextInt(65536) - 32768)
    roundTrip(noisy)
    // smooth ramp: order-2 fixed predictor territory
    roundTrip(Array.tabulate(5000)(i => (i % 3000) - 1500))
  }

  test("coded frame numbers: many frames exercise multi-byte UTF-8") {
    // 140 frames of 4096 pushes frame numbers past 0x7F, so the coded-
    // number field crosses into two-byte UTF-8; blocks stay flat
    // (CONSTANT subframes) to keep the stream small and fast
    val s = Array.tabulate(140 * 4096)(i => (i / 4096) * 100 - 7000)
    roundTrip(s)
  }

  test("corruption: a flipped payload byte fails the CRC, no garbage") {
    val s = Array.tabulate(600)(i => if (i % 2 == 0) 2222 else -2222)
    val bytes = Flac.encode(s, 8000)
    // flip one bit well inside the first frame's residuals
    val corrupt = bytes.clone()
    corrupt(bytes.length - 10) = (corrupt(bytes.length - 10) ^ 0x10).toByte
    assert(Flac.decode(corrupt).isEmpty)
    // truncation and wrong magic also reject
    assert(Flac.decode(bytes.take(bytes.length - 3)).isEmpty)
    assert(Flac.decode("not a flac stream at all".getBytes).isEmpty)
    assert(Flac.decode(Array.empty[Byte]).isEmpty)
  }

  // ---- hand-built streams for decoder-only paths ----

  /** Minimal stream skeleton: magic + STREAMINFO(last) for mono/`bps`
    * 16 unless overridden, then `frame` writes one frame body. */
  private def handStream(total: Int, channels: Int = 1, bps: Int = 16)(
      frame: Flac.BitWriter => Unit): Array[Byte] = {
    val w = new Flac.BitWriter
    "fLaC".foreach(c => w.writeBits(c.toLong, 8))
    w.writeBits(0x80, 8); w.writeBits(34, 24)
    w.writeBits(total.toLong, 16); w.writeBits(total.toLong, 16)
    w.writeBits(0, 24); w.writeBits(0, 24)
    w.writeBits(8000, 20)
    w.writeBits((channels - 1).toLong, 3)
    w.writeBits((bps - 1).toLong, 5)
    w.writeBits(total.toLong, 36)
    (0 until 16).foreach(_ => w.writeBits(0, 8))
    frame(w)
    w.toBytes
  }

  /** Frame header for `n` samples (8-bit blocksize field), channel
    * assignment `chan`, followed by the CRC-8; returns the frame start
    * offset for the footer CRC-16. */
  private def frameHeader(w: Flac.BitWriter, n: Int, chan: Int): Int = {
    val start = w.size
    w.writeBits(0x3FFE, 14); w.writeBit(0); w.writeBit(0)
    w.writeBits(6, 4) // 8-bit blocksize at end
    w.writeBits(0, 4) // rate from STREAMINFO
    w.writeBits(chan.toLong, 4)
    w.writeBits(4, 3) // 16-bit samples
    w.writeBit(0)
    w.writeBits(0, 8) // frame number 0
    w.writeBits((n - 1).toLong, 8)
    val end = w.size
    w.writeBits(Flac.crc8(w.buf.toArray, start, end).toLong, 8)
    start
  }

  private def frameFooter(w: Flac.BitWriter, start: Int): Unit = {
    w.align()
    val end = w.size
    w.writeBits(Flac.crc16(w.buf.toArray, start, end).toLong, 16)
  }

  test("hand-built LPC subframe: coef/shift prediction restores exactly") {
    // x[i] = e[i] + (2 * x[i-1]) >> 1  == e[i] + x[i-1] with coef 2,
    // shift 1 — distinguishable from FIXED order 1 only via the LPC path
    val xs = Array(100, 130, 90, 95, 160, 40, 41, 39)
    val bytes = handStream(xs.length) { w =>
      val start = frameHeader(w, xs.length, chan = 0)
      w.writeBit(0); w.writeBits(32, 6); w.writeBit(0) // LPC order 1
      w.writeBits(xs(0).toLong & 0xFFFF, 16) // warmup
      w.writeBits(4, 4) // precision 5 bits
      w.writeBits(1, 5) // shift 1
      w.writeBits(2, 5) // coef = 2
      w.writeBits(0, 2); w.writeBits(0, 4) // rice, one partition
      val es = (1 until xs.length).map(i => xs(i) - ((2 * xs(i - 1)) >> 1))
      w.writeBits(3, 4) // rice parameter 3
      es.foreach { e =>
        val u = (e.toLong << 1) ^ (e.toLong >> 63)
        w.writeUnary((u >>> 3).toInt)
        w.writeBits(u & 7, 3)
      }
      frameFooter(w, start)
    }
    val (info, decoded) = Flac.decode(bytes).get
    assert(info.totalSamples === xs.length.toLong)
    assert(decoded.toSeq === xs.toSeq)
  }

  test("hand-built escape partition + wasted bits decode correctly") {
    // VERBATIM with 1 wasted bit: effective 15-bit samples, shifted
    // left on output
    val xs = Array(200, -400, 600, 0)
    val verbatim = handStream(xs.length) { w =>
      val start = frameHeader(w, xs.length, chan = 0)
      w.writeBit(0); w.writeBits(1, 6) // VERBATIM
      w.writeBit(1); w.writeUnary(0) // wasted = 1
      xs.foreach(x => w.writeBits((x >> 1).toLong & 0x7FFF, 15))
      frameFooter(w, start)
    }
    assert(Flac.decode(verbatim).get._2.toSeq === xs.toSeq)
    // FIXED order 0 with an ESCAPE-coded partition: raw 16-bit residuals
    val escape = handStream(xs.length) { w =>
      val start = frameHeader(w, xs.length, chan = 0)
      w.writeBit(0); w.writeBits(8, 6); w.writeBit(0) // FIXED order 0
      w.writeBits(0, 2); w.writeBits(0, 4) // rice, one partition
      w.writeBits(0xF, 4) // escape
      w.writeBits(16, 5) // raw bit width
      xs.foreach(x => w.writeBits(x.toLong & 0xFFFF, 16))
      frameFooter(w, start)
    }
    assert(Flac.decode(escape).get._2.toSeq === xs.toSeq)
  }

  test("hand-built multi-partition rice residual (order 1, 4 partitions)") {
    val xs = Array.tabulate(16)(i => i * i - 30) // order-0, partitions 4x4
    val bytes = handStream(xs.length) { w =>
      val start = frameHeader(w, xs.length, chan = 0)
      w.writeBit(0); w.writeBits(8, 6); w.writeBit(0) // FIXED order 0
      w.writeBits(0, 2); w.writeBits(2, 4) // rice, partition order 2
      (0 until 4).foreach { p =>
        w.writeBits(6, 4) // parameter 6 per partition
        (0 until 4).foreach { i =>
          val e = xs(p * 4 + i).toLong
          val u = (e << 1) ^ (e >> 63)
          w.writeUnary((u >>> 6).toInt)
          w.writeBits(u & 63, 6)
        }
      }
      frameFooter(w, start)
    }
    assert(Flac.decode(bytes).get._2.toSeq === xs.toSeq)
  }

  test("hand-built stereo: independent, left/side, right/side, mid/side") {
    val left = Array(1000, -2000, 1500, 7)
    val right = Array(900, -2100, 1499, -7)
    def verbatim(w: Flac.BitWriter, xs: Array[Int], bits: Int): Unit = {
      w.writeBit(0); w.writeBits(1, 6); w.writeBit(0)
      xs.foreach(x => w.writeBits(x.toLong & ((1L << bits) - 1), bits))
    }
    def interleaved(chan: Int, a: Array[Int], aBits: Int,
                    b: Array[Int], bBits: Int) = {
      val bytes = handStream(left.length, channels = 2) { w =>
        val start = frameHeader(w, left.length, chan)
        verbatim(w, a, aBits)
        verbatim(w, b, bBits)
        frameFooter(w, start)
      }
      Flac.decode(bytes).get._2
    }
    val want = left.zip(right).flatMap { case (l, r) => Seq(l, r) }.toSeq
    // independent 2-channel
    assert(interleaved(1, left, 16, right, 16).toSeq === want)
    // left/side: side = L - R, 17 bits
    val side = left.zip(right).map { case (l, r) => l - r }
    assert(interleaved(8, left, 16, side, 17).toSeq === want)
    // right/side: side first
    assert(interleaved(9, side, 17, right, 16).toSeq === want)
    // mid/side: mid = (L+R)>>1
    val mid = left.zip(right).map { case (l, r) => (l + r) >> 1 }
    assert(interleaved(10, mid, 16, side, 17).toSeq === want)
  }
}
