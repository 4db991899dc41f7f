package graft.multimodal

import java.io.ByteArrayOutputStream

/** Deterministic WAV-file writer for the audio decode path — the audio
  * twin of [[ImageFixtures]]: driver-built literal payloads whose
  * sample values derive from the row id by pure integer arithmetic, so
  * the decode oracles pin every decoded number in SQL without an audio
  * library.
  *
  * Emits a fully VALID RIFF/WAVE file — canonical 44-byte header
  * (RIFF + fmt chunk with PCM layout + data chunk), little-endian PCM
  * payload — that any WAV reader (including the JDK's
  * `javax.sound.sampled`) accepts. 16-bit files carry signed samples;
  * 8-bit files carry the WAV-conventional unsigned bytes. */
object AudioFixtures {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Valid PCM WAV: `samples(frame, channel)` supplies the SIGNED
    * sample value — stored as-is for 16-bit, recentered by +128 to the
    * unsigned byte convention for 8-bit. */
  def wav(sampleRate: Int, channels: Int, bitsPerSample: Int, numFrames: Int,
          samples: (Int, Int) => Int): Array[Byte] = {
    require(channels >= 1 && numFrames >= 0)
    require(bitsPerSample == 8 || bitsPerSample == 16,
      s"PCM WAV fixture supports 8/16-bit: $bitsPerSample")
    val blockAlign = channels * bitsPerSample / 8
    val dataLen = numFrames * blockAlign
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(36L + dataLen)) // riff payload size
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(le32(16L))                       // fmt chunk size (PCM)
    out.write(le16(1))                         // audio format: PCM
    out.write(le16(channels))
    out.write(le32(sampleRate.toLong))
    out.write(le32(sampleRate.toLong * blockAlign)) // byte rate
    out.write(le16(blockAlign))
    out.write(le16(bitsPerSample))
    out.write("data".getBytes("US-ASCII"))
    out.write(le32(dataLen.toLong))
    var f = 0
    while (f < numFrames) {
      var c = 0
      while (c < channels) {
        val v = samples(f, c)
        if (bitsPerSample == 16) out.write(le16(v & 0xffff))
        else out.write((v + 128) & 0xff)
        c += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** The shared fixture sample formula — integer arithmetic the oracle
    * replays verbatim: signed value of (frame, channel) in file `id` is
    * `((frame·37 + channel·11 + id) mod 2001) − 1000` at 16 bits and
    * `((frame·37 + channel·11 + id) mod 256) − 128` at 8 bits. */
  def rampSample(id: Long, bits: Int)(frame: Int, channel: Int): Int =
    if (bits == 16) ((frame * 37 + channel * 11 + id.toInt) % 2001) - 1000
    else ((frame * 37 + channel * 11 + id.toInt) % 256) - 128
}
