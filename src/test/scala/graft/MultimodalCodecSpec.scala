package graft

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal

/** Gates for the REAL JDK codec paths (r9 VERDICT item 1): the decode /
  * decodeAudio / resizeImages operators against genuine PNG / BMP / WAV
  * containers synthesized by [[Multimodal.synthesizeImages]] /
  * [[Multimodal.synthesizeWav]], plus every failure path (corrupt
  * container → pseudo fallback, non-WAV → null-stat row, non-image
  * passthrough). The same round-trips are oracle-gated end-to-end on
  * the documents table as SparkEntry p55/p56/p57.
  */
class MultimodalCodecSpec extends SparkSpec {

  private def ids = {
    import spark.implicits._
    // spans both containers (even=PNG, odd=BMP), both resize branches
    // (max dim 16+47%48=63 > 32 down to within-budget), and wraps the
    // mean arithmetic past 256
    Seq(0L, 1L, 7L, 16L, 33L, 100L, 255L).toDF("doc_id")
  }

  private def expected(id: Long) = (
    16 + (id % 48).toInt, 16 + (id % 32).toInt,
    ((id * 31) % 256).toInt, ((id * 57) % 256).toInt,
    ((id * 91) % 256).toInt,
    if (id % 2 == 0) "image/png" else "image/bmp")

  test("synthesized containers are genuine: magic bytes + ImageIO parse") {
    val rows = Multimodal.synthesizeImages(ids, "doc_id").collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]]("media")
      val (w, h, _, _, _, fmt) = expected(id)
      assert(Multimodal.sniffFormat(bytes) === fmt, s"id=$id")
      // the container really parses outside our own decode path
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img.getWidth === w && img.getHeight === h, s"id=$id")
    }
  }

  test("image decode round-trip: dims, channel means, histogram") {
    val decoded = Multimodal.decode(
      Multimodal.synthesizeImages(ids, "doc_id")).collect()
    decoded.foreach { r =>
      val id = r.getAs[Long]("id")
      val (w, h, mr, mg, mb, fmt) = expected(id)
      assert(r.getAs[String]("format") === fmt, s"id=$id")
      assert(r.getAs[Int]("width") === w && r.getAs[Int]("height") === h)
      assert(r.getAs[Int]("mean_r") === mr, s"id=$id mean_r")
      assert(r.getAs[Int]("mean_g") === mg, s"id=$id mean_g")
      assert(r.getAs[Int]("mean_b") === mb, s"id=$id mean_b")
      // solid color ⇒ exactly one nonzero histogram bucket holding every
      // pixel, at the luminance bucket of the (exact) channel means
      val hist = r.getSeq[Long](r.fieldIndex("histogram"))
      assert(hist.count(_ > 0) === 1 && hist.sum === w.toLong * h)
      assert(hist(((mr + mg + mb) / 3) >> 5) === w.toLong * h, s"id=$id")
    }
  }

  test("corrupt container falls back to pseudo-decode, null means") {
    import spark.implicits._
    // PNG magic but garbage body: sniffs as image, ImageIO fails, and
    // the row takes the deterministic pseudo path instead of erroring
    val junk = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10,
      42, 42, 42)
    val df = Seq((5L, junk)).toDF("id", "media")
      .withColumn("meta", struct(lit("fake/raw").as("format"),
        lit(junk.length.toLong).as("n_bytes")))
    val r = Multimodal.decode(df).collect().head
    assert(r.getAs[String]("format") === "fake/raw") // caller's label kept
    assert(r.getAs[Int]("width") === junk.length % 1024 + 1)
    assert(r.isNullAt(r.fieldIndex("mean_r")))
  }

  test("audio decode round-trip: header fields + square-wave peak/RMS") {
    val decoded = Multimodal.decodeAudio(
      Multimodal.synthesizeWav(ids, "doc_id")).collect()
    assert(decoded.length === 7)
    decoded.foreach { r =>
      val id = r.getAs[Long]("id")
      val amp = (1000 + id % 20000).toInt
      assert(r.getAs[String]("format") === "audio/wav")
      assert(r.getAs[Int]("sample_rate") === 8000)
      assert(r.getAs[Int]("channels") === 1)
      assert(r.getAs[Long]("n_frames") === 256 + id % 512, s"id=$id")
      assert(r.getAs[Int]("peak_amp") === amp, s"id=$id peak")
      assert(r.getAs[Int]("rms_amp") === amp, s"id=$id rms")
    }
  }

  test("non-WAV payload yields a null-stat audio row, not a failure") {
    val df = Multimodal.attachBinary(ids.withColumn("text",
      concat(lit("opaque text payload "), col("doc_id"))),
      "doc_id", "text")
    val rows = Multimodal.decodeAudio(df).collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      assert(r.getAs[String]("format") === "application/octet-stream")
      assert(r.isNullAt(r.fieldIndex("sample_rate")))
      assert(r.isNullAt(r.fieldIndex("peak_amp")))
    }
  }

  test("resizeImages: over-budget resampled exactly, within-budget " +
      "passes through byte-identical, non-image untouched") {
    val media = Multimodal.synthesizeImages(ids, "doc_id")
    val before = media.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("media")).toMap
    val resized = Multimodal.resizeImages(media, maxDim = 32)
    val after = resized.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("media")).toMap
    before.foreach { case (id, orig) =>
      val (w, h, mr, mg, mb, fmt) = expected(id)
      val m = math.max(w, h)
      if (m <= 32) {
        // no decode/re-encode loss: the exact original bytes
        assert(java.util.Arrays.equals(after(id), orig), s"id=$id")
      } else {
        val img = ImageIO.read(new ByteArrayInputStream(after(id)))
        assert(img.getWidth === math.max(1, w * 32 / m), s"id=$id w")
        assert(img.getHeight === math.max(1, h * 32 / m), s"id=$id h")
        // solid color survives resampling and the container round-trip
        val p = img.getRGB(0, 0)
        assert(((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
          === ((mr, mg, mb)), s"id=$id color")
        assert(Multimodal.sniffFormat(after(id)) === fmt, s"id=$id fmt")
      }
    }
    // composes with decode downstream: means unchanged by the resample
    Multimodal.decode(resized).collect().foreach { r =>
      val (_, _, mr, mg, mb, _) = expected(r.getAs[Long]("id"))
      assert((r.getAs[Int]("mean_r"), r.getAs[Int]("mean_g"),
        r.getAs[Int]("mean_b")) === ((mr, mg, mb)))
    }
    // non-image payloads pass through unchanged
    val opaque = Multimodal.attachBinary(ids.withColumn("text",
      concat(lit("not an image "), col("doc_id"))), "doc_id", "text")
    val opBefore = opaque.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("media")).toMap
    Multimodal.resizeImages(opaque, maxDim = 32).collect().foreach { r =>
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]]("media"), opBefore(r.getLong(0))))
      assert(r.getAs[org.apache.spark.sql.Row]("meta")
        .getAs[String]("format") === "fake/raw")
    }
  }

  test("GIF and JPEG containers decode through the real path too " +
      "(GIF lossless-exact, JPEG dims exact + means near for a solid " +
      "color)") {
    import spark.implicits._
    def encode(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val gif = encode("gif", 20, 12, 0x64C832) // (100, 200, 50)
    val jpg = encode("jpg", 24, 18, 0x508C3C) // (80, 140, 60)
    assert(Multimodal.sniffFormat(gif) === "image/gif")
    assert(Multimodal.sniffFormat(jpg) === "image/jpeg")
    val df = Seq((1L, gif), (2L, jpg)).toDF("id", "media")
      .withColumn("meta", struct(lit("fake/raw").as("format"),
        length(col("media")).cast("long").as("n_bytes")))
    val rows = Multimodal.decode(df).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    val g = rows(1L)
    assert(g.getAs[String]("format") === "image/gif")
    assert((g.getAs[Int]("width"), g.getAs[Int]("height")) === ((20, 12)))
    // a 1-color GIF palette holds the color exactly
    assert((g.getAs[Int]("mean_r"), g.getAs[Int]("mean_g"),
      g.getAs[Int]("mean_b")) === ((100, 200, 50)))
    val j = rows(2L)
    assert(j.getAs[String]("format") === "image/jpeg")
    assert((j.getAs[Int]("width"), j.getAs[Int]("height")) === ((24, 18)))
    // JPEG is lossy: dims/format are exact, solid-color means land close
    assert(math.abs(j.getAs[Int]("mean_r") - 80) <= 4, j.toString)
    assert(math.abs(j.getAs[Int]("mean_g") - 140) <= 4, j.toString)
    assert(math.abs(j.getAs[Int]("mean_b") - 60) <= 4, j.toString)
  }

  test("AVI round-trip: container parses for real, sampled frame stats " +
      "are exact, truncated container falls back to the null-stat row") {
    val media = Multimodal.synthesizeAvi(ids, "doc_id")
    media.collect().foreach(r =>
      assert(Multimodal.sniffFormat(r.getAs[Array[Byte]]("media"))
        === "video/avi"))
    val rows = Multimodal.sampleVideoFrames(media, k = 3).collect()
    // k=3 picks are distinct for every n >= 3 (0, (n-1)/2, n-1)
    assert(rows.length === 7 * 3)
    rows.foreach { r =>
      val id = r.getAs[Long]("id")
      val n = 3 + (id % 5).toInt
      val f = r.getAs[Int]("frame_idx")
      assert(r.getAs[Int]("n_frames") === n, s"id=$id")
      assert(r.getAs[Int]("width") === 16 + (id % 16).toInt)
      assert(r.getAs[Int]("height") === 8 + (id % 8).toInt)
      assert(r.getAs[Int]("mean_r") === ((id * 31 + f * 17) % 256).toInt)
      assert(r.getAs[Int]("mean_g") === ((id * 57 + f * 23) % 256).toInt)
      assert(r.getAs[Int]("mean_b") === ((id * 91 + f * 29) % 256).toInt)
    }
    // per-id sampled indices: first, middle, last
    val byId = rows.groupBy(_.getAs[Long]("id"))
    byId.foreach { case (id, rs) =>
      val n = 3 + (id % 5).toInt
      assert(rs.map(_.getAs[Int]("frame_idx")).sorted.toSeq
        === Seq(0, (n - 1) / 2, n - 1), s"id=$id")
    }
    // a truncated container (torn mid-movi) degrades to null stats, not
    // a crash — and a non-video payload does the same
    import spark.implicits._
    val whole = media.collect().head.getAs[Array[Byte]]("media")
    val torn = whole.take(40)
    val junk = Seq((9L, torn), (10L, "not a container".getBytes))
      .toDF("id", "media")
    val fallback = Multimodal.sampleVideoFrames(junk, k = 3).collect()
    assert(fallback.length === 2)
    fallback.foreach(r => assert(r.isNullAt(r.fieldIndex("n_frames"))))
  }

  test("MJPEG AVI: real JPEG frames decode to exact gray means; " +
      "gray round-trip is lossless for ALL 256 grays at q=1.0") {
    // exhaustive proof of the gate's load-bearing claim: a solid GRAY
    // frame survives the JFIF YCbCr + quality-1.0 JPEG pipeline
    // bit-exactly (Y = gray since the luma weights sum to 1, Cb = Cr =
    // 128, DC-only quantization lossless). Arbitrary COLORS only
    // round-trip to ±1, which is why the fixture is gray.
    import spark.implicits._
    val grays = (0L until 256L).toDF("doc_id")
    val rows = Multimodal.sampleVideoFrames(
      Multimodal.synthesizeMjpegAvi(
        grays.select((col("doc_id") * 33).as("doc_id")), "doc_id"),
      k = 1).collect()
    // id = 33*g makes frame 0's gray = (33*g*31) % 256 sweep all 256
    // residues (33*31 = 1023 ≡ 255 ≡ -1 mod 256 — a unit)
    assert(rows.length === 256)
    assert(rows.map(r => r.getAs[Int]("mean_r")).toSet.size === 256)
    rows.foreach { r =>
      val id = r.getAs[Long]("id")
      val g = ((id * 31) % 256).toInt
      assert(r.getAs[Int]("mean_r") === g, s"id=$id")
      assert(r.getAs[Int]("mean_g") === g)
      assert(r.getAs[Int]("mean_b") === g)
    }
    // full fixture shape: dims/count arithmetic + picks like the DIB
    // twin, but through a genuinely compressed bitstream (each chunk
    // must be a standalone JPEG ImageIO can read)
    val media = Multimodal.synthesizeMjpegAvi(ids, "doc_id")
    media.collect().foreach { r =>
      val b = r.getAs[Array[Byte]]("media")
      assert(Multimodal.sniffFormat(b) === "video/avi")
      // the first movi chunk payload carries JPEG magic (FFD8)
      val idx = b.indexOfSlice("00dc".getBytes("US-ASCII"))
      assert(idx > 0 && (b(idx + 8) & 0xFF) == 0xFF &&
        (b(idx + 9) & 0xFF) == 0xD8, "frame chunk is not a JPEG")
    }
    val sampled = Multimodal.sampleVideoFrames(media, k = 3).collect()
    assert(sampled.length === 7 * 3)
    sampled.foreach { r =>
      val id = r.getAs[Long]("id")
      val f = r.getAs[Int]("frame_idx")
      val g = ((id * 31 + f * 17) % 256).toInt
      assert(r.getAs[Int]("n_frames") === 3 + (id % 5).toInt)
      assert(r.getAs[Int]("width") === 16 + (id % 16).toInt)
      assert(r.getAs[Int]("height") === 8 + (id % 8).toInt)
      assert(r.getAs[Int]("mean_r") === g, s"id=$id f=$f")
      assert(r.getAs[Int]("mean_g") === g)
      assert(r.getAs[Int]("mean_b") === g)
    }
  }

  test("MP4 round-trip: ISO-BMFF box walk + stsc chunk-run expansion, " +
      "sampled frame stats exact, torn/foreign payloads degrade to " +
      "null-stat rows") {
    val media = Multimodal.synthesizeMp4(ids, "doc_id")
    media.collect().foreach(r =>
      assert(Multimodal.sniffFormat(r.getAs[Array[Byte]]("media"))
        === "video/mp4"))
    val rows = Multimodal.sampleVideoFrames(media, k = 3).collect()
    assert(rows.length === 7 * 3)
    rows.foreach { r =>
      val id = r.getAs[Long]("id")
      val n = 3 + (id % 6).toInt
      val f = r.getAs[Int]("frame_idx")
      assert(r.getAs[Int]("n_frames") === n, s"id=$id")
      assert(r.getAs[Int]("width") === 12 + (id % 20).toInt)
      assert(r.getAs[Int]("height") === 6 + (id % 10).toInt)
      assert(r.getAs[Int]("mean_r") === ((id * 37 + f * 19) % 256).toInt)
      assert(r.getAs[Int]("mean_g") === ((id * 53 + f * 29) % 256).toInt)
      assert(r.getAs[Int]("mean_b") === ((id * 89 + f * 31) % 256).toInt)
    }
    // the fixtures pack TWO samples per chunk (odd counts end in a short
    // tail chunk), so exact means prove the stsc expansion walked runs,
    // not a 1:1 shortcut; per-id picks are first/middle/last
    val byId = rows.groupBy(_.getAs[Long]("id"))
    byId.foreach { case (id, rs) =>
      val n = 3 + (id % 6).toInt
      assert(rs.map(_.getAs[Int]("frame_idx")).sorted.toSeq
        === Seq(0, (n - 1) / 2, n - 1).distinct, s"id=$id")
    }
    // torn container (cut inside mdat, so stco points past the end),
    // and a non-container payload: null-stat rows, never a crash
    import spark.implicits._
    val whole = media.collect().head.getAs[Array[Byte]]("media")
    val torn = whole.take(64)
    val junk = Seq((9L, torn), (10L, "ftyp is not at 4".getBytes))
      .toDF("id", "media")
    val fallback = Multimodal.sampleVideoFrames(junk, k = 3).collect()
    assert(fallback.length === 2)
    fallback.foreach(r => assert(r.isNullAt(r.fieldIndex("n_frames"))))
  }

  test("video codec plug-in seam: an avc1 MP4 rejects to null-stat " +
      "rows unregistered, flows through sampleVideoFrames with a " +
      "registered fake decoder, and rejects again after unregister") {
    // same container, avc1 sample entry; payload stays raw RGB24 so
    // the FAKE decoder can produce verifiable stats — what's under
    // test is the seam (registry -> container walk -> sampling host),
    // not a JVM H.264 implementation
    val media = Multimodal.synthesizeMp4(ids, "doc_id", "avc1")

    // 1) unregistered: the documented reject — container walks fine
    //    but the sample entry has no decoder -> null-stat fallback
    val before = Multimodal.sampleVideoFrames(media, k = 3).collect()
    assert(before.length === 7)
    before.foreach(r => assert(r.isNullAt(r.fieldIndex("n_frames"))))

    // 2) registered: identical rows to the raw path, through the SAME
    //    sampleVideoFrames host (dims come from the decoder — ground
    //    truth per frame, like the MJPEG path)
    Multimodal.registerVideoCodec("avc1", (b, off, size) => {
      // stand-in for a JNI H.264 decode: the fixture's "compressed"
      // sample is packed top-down RGB24 of unknown dims; recover them
      // from the sample size (h = 3 pixel rows per synthetic w... the
      // fixture keeps w*h*3 == size with w,h from the id, so derive
      // means only and dims via exhaustive small search)
      val candidates = for {
        w <- 12 until 32; h <- 6 until 16
        if w * h * 3 == size
      } yield (w, h)
      candidates.headOption.flatMap { case (w, h) =>
        var (sr, sg, sb) = (0L, 0L, 0L)
        var p = off
        while (p < off + size) {
          sr += b(p) & 0xFF; sg += b(p + 1) & 0xFF; sb += b(p + 2) & 0xFF
          p += 3
        }
        val n = w.toLong * h
        Some((w, h, (sr / n).toInt, (sg / n).toInt, (sb / n).toInt))
      }
    })
    try {
      val rows = Multimodal.sampleVideoFrames(media, k = 3).collect()
      assert(rows.length === 7 * 3)
      rows.foreach { r =>
        val id = r.getAs[Long]("id")
        val f = r.getAs[Int]("frame_idx")
        assert(r.getAs[Int]("n_frames") === 3 + (id % 6).toInt)
        assert(r.getAs[Int]("mean_r") === ((id * 37 + f * 19) % 256).toInt)
        assert(r.getAs[Int]("mean_g") === ((id * 53 + f * 29) % 256).toInt)
        assert(r.getAs[Int]("mean_b") === ((id * 89 + f * 31) % 256).toInt)
      }
    } finally Multimodal.unregisterVideoCodec("avc1")

    // 3) unregistered again: back to the loud-but-total reject
    val after = Multimodal.sampleVideoFrames(media, k = 3).collect()
    assert(after.forall(_.isNullAt(after.head.fieldIndex("n_frames"))))
  }

  test("sniffFormat magic bytes") {
    assert(Multimodal.sniffFormat("RIFFxxxxWAVEfmt ".getBytes) ===
      "audio/wav")
    assert(Multimodal.sniffFormat(
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)) ===
      "image/jpeg")
    assert(Multimodal.sniffFormat("GIF89a".getBytes) === "image/gif")
    assert(Multimodal.sniffFormat("BM".getBytes) ===
      "application/octet-stream") // too short for a BMP header
    assert(Multimodal.sniffFormat("plain text".getBytes) ===
      "application/octet-stream")
  }
}
