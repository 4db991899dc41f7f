package graft

import graft.multimodal.{AudioFixtures, ImageFixtures, Multimodal, VideoFixtures}

/** AVI container metadata decode: field-exact parse of the fixture
  * header, and hostile-input robustness — every truncation prefix of a
  * valid file must produce a row (parse or sentinel), never a throw. */
class VideoSpec extends SparkSpec {
  import spark.implicits._

  test("parses the avih fields exactly") {
    val b = VideoFixtures.avi(33333L, 240L, 2L, 1920L, 1080L)
    val got = Multimodal.decodeAviMeta(spark, Seq((1L, b)).toDF("id", "bytes"))
      .collect()(0)
    assert(got.format == "avi" && got.width == 1920L && got.height == 1080L &&
      got.n_frames == 240L && got.n_streams == 2L)
    assert(math.abs(got.fps - 30.00030000300003) < 1e-9)
    assert(math.abs(got.duration_ms - 240 * 33333 / 1000.0) < 1e-9)
  }

  test("every truncation prefix yields a row, never a throw") {
    val full = VideoFixtures.avi(40000L, 100L, 1L, 640L, 480L)
    val rows = full.indices.map(n => (n.toLong, full.take(n)))
    val got = Multimodal.decodeAviMeta(spark, rows.toDF("id", "bytes")).collect()
    assert(got.length == full.length)
    // only the complete header parses; every prefix is a sentinel row
    assert(got.forall(r => r.format == "invalid" || r.id == full.length - 1 ||
      r.format == "avi"))
    assert(got.count(_.format == "avi") <= 1)
  }

  test("hostile chunk sizes terminate: negative/oversized u32 cannot stall the walk") {
    // 0xFFFFFFF8 truncates to Int -8, which without a guard makes the
    // chunk step 8 + (-8) + 0 = 0 — an infinite loop. Craft a RIFF/AVI
    // whose first top-level chunk declares that size.
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val hostile = "RIFF".getBytes("US-ASCII") ++ le32(100L) ++
      "AVI ".getBytes("US-ASCII") ++
      "JUNK".getBytes("US-ASCII") ++ le32(0xFFFFFFF8L) ++ Array.fill(64)(0.toByte)
    val got = Multimodal.decodeAviMeta(spark, Seq((1L, hostile)).toDF("id", "bytes"))
      .collect()(0)
    assert(got.format == "invalid")
  }

  test("cross-modality RIFF payloads are rejected (WAV is not AVI)") {
    val wav = AudioFixtures.wav(8000, 1, 16, 10, AudioFixtures.rampSample(0L, 16))
    val got = Multimodal.decodeAviMeta(spark, Seq((1L, wav)).toDF("id", "bytes"))
      .collect()(0)
    assert(got.format == "invalid")
  }

  test("idx1 frame index: entries parse with keyframe flags and movi-relative offsets") {
    val frames = Seq((100L, true), (40L, false), (60L, false), (80L, true))
    val b = VideoFixtures.aviWithIndex(40000L, 1, 160, 120, frames)
    // the extended container still parses as a valid AVI header
    val meta = Multimodal.decodeAviMeta(spark, Seq((1L, b)).toDF("id", "bytes"))
      .collect()(0)
    assert(meta.format == "avi" && meta.n_frames == 4L)
    val idx = Multimodal.decodeAviFrameIndex(spark, Seq((1L, b)).toDF("id", "bytes"))
      .collect().sortBy(_.frame_no)
      .map(f => (f.frame_no, f.fourcc, f.keyframe, f.offset, f.size)).toSeq
    // offsets: 4, then +8+size per prior frame
    assert(idx == Seq(
      (0L, "00dc", true, 4L, 100L),
      (1L, "00dc", false, 112L, 40L),
      (2L, "00dc", false, 160L, 60L),
      (3L, "00dc", true, 228L, 80L)), s"got ${idx.toSeq}")
    // a header-only AVI (no idx1) and garbage contribute zero rows
    val none = Multimodal.decodeAviFrameIndex(spark, Seq(
      (2L, VideoFixtures.avi(40000L, 7, 1, 160, 120)),
      (3L, "junk".getBytes("UTF-8"))).toDF("id", "bytes"))
    assert(none.count() == 0L)
  }

  test("jpegDecodable round-trips EXACT block values through the JDK decoder") {
    // the contract the MJPEG arithmetic oracle rests on: DC-only
    // blocks + unit quant + zero chroma decode to the exact target
    // value in every channel of every pixel
    val vals = Map((0, 0) -> 0, (1, 0) -> 255, (0, 1) -> 37, (1, 1) -> 200)
    val b = ImageFixtures.jpegDecodable(16, 16, (bx, by) => vals((bx, by)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    assert(img != null, "decoder rejected the baseline stream")
    assert(img.getWidth == 16 && img.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = vals((x / 8, y / 8))
      val rgb = img.getRGB(x, y)
      val (r, g, bl) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      assert(r == want && g == want && bl == want,
        s"pixel ($x,$y): got ($r,$g,$bl), want $want")
    }
  }

  test("MJPEG frame pixel decode: exact per-frame means; corrupt frames map to sentinels") {
    val frames = (0 until 4).map { f =>
      (ImageFixtures.jpegDecodable(16, 16,
        (bx, by) => (11 * f + 5 * (by * 2 + bx)) % 256), f % 3 == 0)
    }
    val avi = VideoFixtures.mjpegAvi(40000L, 1, 16, 16, frames)
    val got = Multimodal.decodeAviFramePixels(spark,
        Seq((7L, avi)).toDF("id", "bytes"))
      .collect().sortBy(_.frame_no)
      .map(p => (p.frame_no, p.width, p.height, p.mean_rgb)).toSeq
    val want = (0 until 4).map { f =>
      val m = (0 until 4).map(bi => (11 * f + 5 * bi) % 256).sum / 4.0
      (f.toLong, 16L, 16L, m)
    }
    assert(got == want, s"got $got, want $want")
    // a frame whose payload bytes are garbage yields a sentinel row,
    // the others still decode
    val mixed = VideoFixtures.mjpegAvi(40000L, 1, 16, 16, Seq(
      (frames.head._1, true),
      ("not a jpeg at all".getBytes("UTF-8"), false)))
    val rows = Multimodal.decodeAviFramePixels(spark,
        Seq((8L, mixed)).toDF("id", "bytes"))
      .collect().sortBy(_.frame_no)
    assert(rows(0).width == 16L && rows(1).width == -1L &&
      rows(1).mean_rgb == -1.0)
    // index-less AVIs and garbage payloads contribute zero rows
    assert(Multimodal.decodeAviFramePixels(spark, Seq(
      (9L, VideoFixtures.avi(40000L, 7, 1, 160, 120)),
      (10L, "junk".getBytes("UTF-8"))).toDF("id", "bytes")).count() == 0L)
  }
}
