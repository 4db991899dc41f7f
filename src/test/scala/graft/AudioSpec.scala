package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{AudioFixtures, Multimodal}

/** Real WAV/PCM decode through javax.sound.sampled: header metadata,
  * sample decode (sign, endianness, interleave, 8-bit recentering),
  * and corrupt-payload sentinels. */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  test("header metadata decodes every layout field") {
    val media = Seq(
      (0L, AudioFixtures.wav(16000, 2, 16, 120, (_, _) => 0)),
      (1L, AudioFixtures.wav(8000, 1, 8, 77, (_, _) => 0)))
      .toDF("id", "bytes")
    val out = Multimodal.decodeWavMeta(spark, media).collect()
      .map(m => m.id -> m).toMap
    assert(out(0L) == Multimodal.WavMeta(0L, "wav", 16000L, 2L, 16L, 120L,
      120 * 1000.0 / 16000))
    assert(out(1L) == Multimodal.WavMeta(1L, "wav", 8000L, 1L, 8L, 77L,
      77 * 1000.0 / 8000))
  }

  test("16-bit signed samples round-trip exactly, including negatives") {
    // 3 frames stereo with hand-picked values crossing zero
    val vals = Map((0, 0) -> -1000, (0, 1) -> 1000, (1, 0) -> -1,
      (1, 1) -> 0, (2, 0) -> 32767, (2, 1) -> -32768)
    val media = Seq((0L, AudioFixtures.wav(8000, 2, 16, 3, (f, c) => vals(f -> c))))
      .toDF("id", "bytes")
    val s = Multimodal.decodeWavStats(spark, media).collect().head
    val expected = vals.values.toSeq
    assert(s.n_samples == 6L)
    assert(s.mean_sample == expected.sum.toDouble / 6)
    assert(s.peak == 32768L)
    assert(s.rms == math.sqrt(expected.map(v => v.toDouble * v).sum / 6))
  }

  test("8-bit unsigned bytes are recentered to signed values") {
    val media = Seq((0L, AudioFixtures.wav(8000, 1, 8, 4,
      (f, _) => Seq(-128, -1, 0, 127)(f)))).toDF("id", "bytes")
    val s = Multimodal.decodeWavStats(spark, media).collect().head
    assert(s.n_samples == 4L)
    assert(s.mean_sample == (-128 - 1 + 0 + 127) / 4.0)
    assert(s.peak == 128L)
  }

  test("non-PCM encodings and degenerate headers yield sentinels, not wrong numbers") {
    def patched(b: Array[Byte], off: Int, vals: Int*): Array[Byte] = {
      val c = b.clone()
      vals.zipWithIndex.foreach { case (v, i) => c(off + i) = v.toByte }
      c
    }
    val pcm8 = AudioFixtures.wav(8000, 1, 8, 20, (f, _) => f % 7)
    val pcm16 = AudioFixtures.wav(8000, 1, 16, 20, (f, _) => f % 7)
    val media = Seq(
      (0L, patched(pcm8, 20, 6, 0)),       // fmt code 6: a-law, NOT PCM
      (1L, patched(pcm8, 20, 7, 0)),       // fmt code 7: µ-law
      (2L, patched(pcm16, 24, 0, 0, 0, 0)) // declared sample rate 0
    ).toDF("id", "bytes")
    val stats = Multimodal.decodeWavStats(spark, media).collect()
      .map(s => s.id -> s).toMap
    assert(stats(0L).n_samples == -1L && stats(1L).n_samples == -1L,
      "companded encodings must not be decoded as PCM")
    val metas = Multimodal.decodeWavMeta(spark, media).collect()
      .map(m => m.id -> m).toMap
    assert(metas(2L).format == "invalid" && metas(2L).duration_ms == -1.0,
      "rate-0 header must not emit a non-finite duration")
  }

  test("corrupt, truncated, and empty payloads yield sentinels, never throw") {
    val media = Seq(
      (0L, "not audio".getBytes("UTF-8")),
      (1L, AudioFixtures.wav(8000, 1, 16, 10, (_, _) => 5).take(17)),
      (2L, Array.empty[Byte])).toDF("id", "bytes")
    val metas = Multimodal.decodeWavMeta(spark, media).collect()
    assert(metas.forall(_.format == "invalid"))
    val stats = Multimodal.decodeWavStats(spark, media).collect()
    assert(stats.forall(s => s.n_samples == -1L && s.peak == -1L))
  }
}
