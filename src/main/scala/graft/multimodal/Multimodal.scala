package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, decoded executor-side in batches.
  *
  * The IMAGE modality has a real decoder: the native
  * [[graft.functions.ImageMeta]] expression parses PNG/JPEG/GIF
  * headers byte-for-byte (dependency-free, like [[PdfText]]), and the
  * `image_meta` oracle query verifies it against arithmetic-derived
  * expected rows over [[ImageFixtures]]' spec-valid files. This object
  * keeps the BATCHED-decoder pipeline shape for codecs that need heavy
  * per-partition setup (audio/video): the Spark-side plumbing — schema,
  * partition-level batched decode via `mapPartitions` with a typed
  * Encoder, deterministic feature output — is real, while `decodeStub`
  * stands in for an ffmpeg-class library this container doesn't ship.
  * Swapping in such a decoder changes only that one function; the
  * pipeline shape (binary in → struct features out, no driver
  * involvement, no shuffle) is what runs at 100 TB.
  */
object Multimodal {

  /** Decoded-media feature row. */
  case class MediaFeature(id: Long, modality: String, byte_len: Long,
                          content_hash: String, width: Long, height: Long)

  /** Attach a binary payload column. In production this is
    * `spark.read.format("binaryFile")` over a media bucket (the
    * reference's PDF ArrayBuffer path, `/root/reference/App.tsx:46-47`);
    * here UTF-8 text bytes stand in. */
  def asBinary(df: DataFrame, idCol: String, textCol: String,
               modality: String = "image"): DataFrame =
    df.select(col(idCol).as("id"), lit(modality).as("modality"),
      encode(col(textCol), "UTF-8").as("bytes"))

  // ===================== STUB =====================
  /** Deterministic fake decode of one payload. A real implementation
    * calls the image/audio codec here (javax.imageio / ffmpeg bindings);
    * everything around it — batching, encoders, partitioning — is the
    * production shape. */
  private def decodeStub(id: Long, modality: String, bytes: Array[Byte]): MediaFeature = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hash = md.digest(bytes).map("%02x".format(_)).mkString
    // fake dimensions from the first/last CODEPOINT of the decoded text
    // (not raw bytes — keeps the oracle's ord() semantics for non-ASCII)
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val w = if (s.isEmpty) 0L else s.codePointAt(0).toLong % 64 + 1
    val h = if (s.isEmpty) 0L else s.codePointBefore(s.length).toLong % 64 + 1
    MediaFeature(id, modality, bytes.length.toLong, hash, w, h)
  }
  // ================================================

  /** Partition-batched decode: one decoder instance per partition (the
    * expensive part for real codecs), streaming rows through it. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("id"), col("modality"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here
        it.map { case (id, m, b) => decodeStub(id, m, b) }
      }
  }

  /** Decoded-pixel feature row: container metadata + the mean of the
    * per-pixel channel means. Sentinels (-1) rather than NULLs on
    * undecodable payloads, per the comparator convention. */
  case class ImagePixels(id: Long, format: String, width: Long, height: Long,
                         mean_rgb: Double)

  /** REAL pixel decode for the image modality — `javax.imageio` ships
    * in the JDK, so unlike the audio/video stub this path actually
    * decompresses the bitstream (the PNG fixtures' deflate scanlines
    * included) executor-side, through the same partition-batched
    * pipeline shape as [[decodeFeatures]]. Header metadata comes from
    * [[graft.functions.ImageMeta]]'s parser; pixels from the decoder.
    * The per-pixel sum runs in row-major order — integer-valued
    * doubles, exact up to 2^53 — so the mean reproduces exactly and an
    * arithmetic oracle can pin it. Undecodable bytes (including our
    * metadata-only JPEG fixtures, which carry no scan data) map to
    * sentinel rows, never a throw. */
  def decodePixelStats(spark: SparkSession, media: DataFrame): Dataset[ImagePixels] = {
    import spark.implicits._
    media.select(col("id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          val invalid = ImagePixels(id, "invalid", -1L, -1L, -1.0)
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
            if (img == null) invalid
            else {
              val meta = graft.functions.ImageMeta.parse(b)
              val fmt = if (meta == null) "unknown" else meta._1
              val (w, h) = (img.getWidth, img.getHeight)
              var sum = 0.0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
                  x += 1
                }
                y += 1
              }
              ImagePixels(id, fmt, w.toLong, h.toLong, sum / (w.toLong * h))
            }
          } catch { case scala.util.control.NonFatal(_) => invalid }
        }
      }
  }
}
