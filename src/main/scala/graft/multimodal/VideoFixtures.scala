package graft.multimodal

import java.io.ByteArrayOutputStream

/** Deterministic AVI-container writer for the video metadata path —
  * the video sibling of [[AudioFixtures]]: driver-built literal
  * payloads whose header fields derive from the row id by pure
  * integer arithmetic, so the decode oracle pins every parsed number
  * in SQL without a codec.
  *
  * Emits a structurally VALID RIFF/AVI prefix: `RIFF('AVI ')`
  * containing `LIST('hdrl')` whose first subchunk is the canonical
  * 56-byte `avih` main header (OpenDML/VfW layout: microseconds per
  * frame, max bytes/sec, padding, flags, total frames, initial
  * frames, stream count, suggested buffer, width, height + 4
  * reserved dwords). Frame DATA is out of scope — container METADATA
  * is the Spark-side feature; decoding pixels needs a codec this
  * environment doesn't ship (the documented stub boundary in
  * [[Multimodal.decodeFeatures]]). */
object VideoFixtures {

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** [[avi]] extended with a real frame layout: a `LIST('movi')` of
    * `00dc` video chunks (payloads are zero bytes — the codec stub
    * boundary; SIZES are the signal) and the standard `idx1` index
    * whose 16-byte entries carry (ckid, flags with AVIIF_KEYFRAME,
    * offset-from-'movi', size). Frame sizes must be EVEN (no RIFF
    * padding ambiguity in the offset arithmetic — enforced). */
  def aviWithIndex(usPerFrame: Long, streams: Long, width: Long,
                   height: Long,
                   frames: Seq[(Long, Boolean)]): Array[Byte] = {
    require(frames.forall(_._1 % 2 == 0), "frame sizes must be even")
    val head = avi(usPerFrame, frames.size.toLong, streams, width, height)
    // movi list: '00dc' chunks back to back; offsets are relative to
    // the position of the 'movi' fourcc (the common idx1 convention)
    val movi = new ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    val offsets = Seq.newBuilder[Long]
    frames.foreach { case (size, _) =>
      offsets += movi.size().toLong
      movi.write("00dc".getBytes("US-ASCII"))
      movi.write(le32(size))
      movi.write(new Array[Byte](size.toInt))
    }
    val moviBytes = movi.toByteArray
    val idx = new ByteArrayOutputStream()
    idx.write("idx1".getBytes("US-ASCII"))
    idx.write(le32(16L * frames.size))
    frames.zip(offsets.result()).foreach { case ((size, key), off) =>
      idx.write("00dc".getBytes("US-ASCII"))
      idx.write(le32(if (key) 0x10L else 0L))
      idx.write(le32(off))
      idx.write(le32(size))
    }
    val out = new ByteArrayOutputStream()
    // splice: head is RIFF(sizeS)'AVI ' + hdrl list; append movi+idx1
    // and fix the RIFF size
    val tail = ("LIST".getBytes("US-ASCII") ++ le32(moviBytes.length.toLong) ++
      moviBytes) ++ idx.toByteArray
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32((head.length - 8) + tail.length.toLong))
    out.write(head, 8, head.length - 8)
    out.write(tail)
    out.toByteArray
  }

  /** [[aviWithIndex]] with REAL frame payloads — the MJPEG fixture:
    * each `00dc` chunk carries actual JPEG bytes (built by
    * [[ImageFixtures.jpegDecodable]] for exact-arithmetic decode), the
    * `idx1` entries carry their true offsets/sizes, and odd-sized
    * payloads get the RIFF even-padding byte (outside the recorded
    * size, per spec). This is what a real MJPEG-in-AVI file looks
    * like: the container is the index, the frames are plain JPEGs. */
  def mjpegAvi(usPerFrame: Long, streams: Long, width: Long, height: Long,
               frames: Seq[(Array[Byte], Boolean)]): Array[Byte] = {
    val head = avi(usPerFrame, frames.size.toLong, streams, width, height)
    val movi = new ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    val offsets = Seq.newBuilder[Long]
    frames.foreach { case (payload, _) =>
      offsets += movi.size().toLong
      movi.write("00dc".getBytes("US-ASCII"))
      movi.write(le32(payload.length.toLong))
      movi.write(payload)
      if (payload.length % 2 == 1) movi.write(0) // RIFF pad, not in size
    }
    val moviBytes = movi.toByteArray
    val idx = new ByteArrayOutputStream()
    idx.write("idx1".getBytes("US-ASCII"))
    idx.write(le32(16L * frames.size))
    frames.zip(offsets.result()).foreach { case ((payload, key), off) =>
      idx.write("00dc".getBytes("US-ASCII"))
      idx.write(le32(if (key) 0x10L else 0L))
      idx.write(le32(off))
      idx.write(le32(payload.length.toLong))
    }
    val out = new ByteArrayOutputStream()
    val tail = ("LIST".getBytes("US-ASCII") ++ le32(moviBytes.length.toLong) ++
      moviBytes) ++ idx.toByteArray
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32((head.length - 8) + tail.length.toLong))
    out.write(head, 8, head.length - 8)
    out.write(tail)
    out.toByteArray
  }

  /** Valid AVI header-only container with the given main-header
    * fields. */
  def avi(usPerFrame: Long, totalFrames: Long, streams: Long,
          width: Long, height: Long): Array[Byte] = {
    val avih = new ByteArrayOutputStream()
    avih.write("avih".getBytes("US-ASCII"))
    avih.write(le32(56L))          // avih payload size
    avih.write(le32(usPerFrame))
    avih.write(le32(0L))           // dwMaxBytesPerSec
    avih.write(le32(0L))           // dwPaddingGranularity
    avih.write(le32(0x10L))        // dwFlags (AVIF_HASINDEX)
    avih.write(le32(totalFrames))
    avih.write(le32(0L))           // dwInitialFrames
    avih.write(le32(streams))
    avih.write(le32(0L))           // dwSuggestedBufferSize
    avih.write(le32(width))
    avih.write(le32(height))
    (0 until 4).foreach(_ => avih.write(le32(0L))) // dwReserved[4]
    val hdrl = "hdrl".getBytes("US-ASCII") ++ avih.toByteArray
    val out = new ByteArrayOutputStream()
    val listBytes = "LIST".getBytes("US-ASCII") ++ le32(hdrl.length.toLong) ++ hdrl
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(4L + listBytes.length)) // 'AVI ' + payload
    out.write("AVI ".getBytes("US-ASCII"))
    out.write(listBytes)
    out.toByteArray
  }
}
