package graft

import org.apache.spark.sql.functions._

import graft.functions.ImageMeta
import graft.multimodal.ImageFixtures

/** Pins the real image-metadata decoder: valid PNG/JPEG/GIF parse to
  * their exact dimensions; truncated/corrupt/unknown payloads are NULL
  * (the one-bad-file-must-not-poison-the-batch contract), never a
  * throw. */
class ImageMetaSpec extends SparkSpec {
  import spark.implicits._

  private def metaOf(payloads: Seq[(Long, Array[Byte])]): Map[Long, Option[(String, Int, Int, Int)]] =
    payloads.toDF("id", "payload")
      .select(col("id"), ImageMeta(col("payload")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"), col("m.bit_depth"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))))
      .toMap

  test("valid PNG/JPEG/GIF decode to their exact header metadata") {
    val out = metaOf(Seq(
      (0L, ImageFixtures.png(640, 480)),
      (1L, ImageFixtures.jpeg(31, 17)),
      (2L, ImageFixtures.jpeg(31, 17, precision = 12, sof = 0xc2)), // progressive
      (3L, ImageFixtures.gif(12, 99)),
      (4L, ImageFixtures.png(1, 1))))
    assert(out(0L).contains(("png", 640, 480, 8)))
    assert(out(1L).contains(("jpeg", 31, 17, 8)))
    assert(out(2L).contains(("jpeg", 31, 17, 12)))
    assert(out(3L).contains(("gif", 12, 99, 8)))
    assert(out(4L).contains(("png", 1, 1, 8)))
  }

  test("PNG fixtures are real files: a PNG decoder reads the same pixels back") {
    // the fixture writer must emit a VALID file (CRCs, deflate stream),
    // not just a recognizable header — javax.imageio ships in the JDK
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ImageFixtures.png(7, 5)))
    assert(img != null, "JDK decoder rejected the fixture")
    assert(img.getWidth == 7 && img.getHeight == 5)
    // deterministic (x+y) ramp: red channel of pixel (2,3) is (2+3)=5
    assert(((img.getRGB(2, 3) >> 16) & 0xff) == 5)
  }

  test("truncated, corrupt, unknown, and empty payloads are NULL, never a throw") {
    val png = ImageFixtures.png(50, 40)
    val jpg = ImageFixtures.jpeg(50, 40)
    val cases: Seq[(Long, Array[Byte])] =
      // every truncation point of the PNG header region
      (0 until 26).map(n => (100L + n, png.take(n))) ++ Seq(
        (1L, jpg.take(3)),                        // JPEG cut inside markers
        (2L, jpg.take(9)),                        // JPEG cut inside APP0
        (3L, Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)), // SOI+EOI, no SOF
        (4L, "GIF89a".getBytes("US-ASCII")),      // GIF cut before descriptor
        (5L, "plain text, no image".getBytes("UTF-8")),
        (6L, Array.empty[Byte]),
        (7L, { val b = png.clone(); b(12) = 'X'.toByte; b })) // IHDR type corrupted
    val out = metaOf(cases)
    out.foreach { case (id, v) => assert(v.isEmpty, s"id $id should be NULL, got $v") }
  }

  test("null input stays null; SQL registration exposes image_meta to spark.sql") {
    GraftExtensions.register(spark)
    val row = Seq((0L, ImageFixtures.gif(3, 4))).toDF("id", "payload")
    row.createOrReplaceTempView("img_fixture")
    val viaSql = spark.sql(
      "SELECT image_meta(payload).width AS w, image_meta(payload).format AS f FROM img_fixture")
      .collect().head
    assert(viaSql.getInt(0) == 3 && viaSql.getString(1) == "gif")
    val nullRow = Seq((0L, null: Array[Byte])).toDF("id", "payload")
      .select(ImageMeta(col("payload")).as("m")).collect().head
    assert(nullRow.isNullAt(0))
  }

  test("dHash: decoded bits match the closed-form grid; invalids sentinel") {
    import graft.multimodal.{ImageFixtures, Multimodal}
    // closed form on the (x+y)%256 ramp: gray at grid (gx, gy) is
    // (gx*w/9 + gy*h/8) % 256, bit = right neighbor brighter
    def expectBits(w: Int, h: Int): String =
      (for (y <- 0 until 8; x <- 0 until 8) yield {
        val g1 = ((x + 1) * w / 9 + y * h / 8) % 256
        val g0 = (x * w / 9 + y * h / 8) % 256
        if (g1 > g0) '1' else '0'
      }).mkString
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, ImageFixtures.png(520, 400)), (2L, ImageFixtures.png(97, 53)),
      (3L, ImageFixtures.jpeg(5, 5)),
      (4L, "not an image".getBytes("UTF-8")))
    val got = Multimodal.decodeDHash(spark, rows.toDF("id", "bytes")).collect()
      .map(r => r.id -> ((r.format, r.dhash_bits))).toMap
    assert(got(1L) == (("png", expectBits(520, 400))), s"got ${got(1L)}")
    assert(got(2L) == (("png", expectBits(97, 53))), s"got ${got(2L)}")
    assert(got(3L)._1 == "invalid" && got(4L)._1 == "invalid")
  }

  test("dHash near-dup pairs: band join finds all pairs within Hamming 3, none beyond") {
    import graft.multimodal.{ImageFixtures, Multimodal}
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, ImageFixtures.png(520, 400)),   // base
      (2L, ImageFixtures.png(490, 400)),   // hamming 3 from base
      (3L, ImageFixtures.png(520, 400)),   // exact dup of base
      (4L, ImageFixtures.png(600, 480)),   // hamming 25 — out
      (5L, ImageFixtures.png(150, 120)),   // hamming 14 — out
      (6L, ImageFixtures.jpeg(5, 5)))      // invalid — excluded
    val hashes = Multimodal.decodeDHash(spark, rows.toDF("id", "bytes")).toDF()
    val got = Multimodal.dhashNearDupPairs(hashes, 3)
      .orderBy(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 3L), (1L, 3L, 0L), (2L, 3L, 3L)), s"got $got")
    // threshold 0 keeps only the exact duplicate
    val exact = Multimodal.dhashNearDupPairs(hashes, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exact == Seq((1L, 3L)), s"got $exact")
  }

  test("dHash store: delta pairs ≡ batch pairs restricted to the delta, store pruned") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import graft.multimodal.{ImageFixtures, Multimodal}
    val corpus: Seq[(Long, Array[Byte])] = Seq(
      (1L, ImageFixtures.png(520, 400)), (2L, ImageFixtures.png(490, 400)),
      (3L, ImageFixtures.png(520, 400)), (4L, ImageFixtures.png(600, 480)),
      (5L, ImageFixtures.png(150, 120)))
    val delta: Seq[(Long, Array[Byte])] = Seq(
      (11L, ImageFixtures.png(520, 400)),     // dup of 1/3
      (12L, ImageFixtures.png(600, 480)),     // dup of 4
      (14L, ImageFixtures.png(490, 400)),     // dup of 2, near 11
      (15L, "junk".getBytes("UTF-8")))        // invalid — never bands
    val store = java.nio.file.Files.createTempDirectory("graft-dhash").toString + "/store"
    val cHashes = Multimodal.decodeDHash(spark, corpus.toDF("id", "bytes")).toDF()
    Multimodal.writeDHashStore(cHashes, store, bandBuckets = 8)
    val dHashes = Multimodal.decodeDHash(spark, delta.toDF("id", "bytes")).toDF()
    val got = Multimodal.imageDeltaDupPairs(dHashes, store, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    // the contract: batch pairs over (corpus ∪ delta), keep only pairs
    // involving a delta image
    val want = Multimodal.dhashNearDupPairs(
        cHashes.unionByName(dHashes), 3)
      .filter(col("id_b") >= 11L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == want, s"delta $got vs batch-restricted $want")
    assert(got.nonEmpty, "fixture must produce cross and internal dup pairs")
    // the store's bands scan is partition-pruned to the delta's buckets
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    // a one-band probe opens only that band's bucket partition
    val one = spark.read.parquet(s"$store/bands").filter(col("__bb") === 0)
    one.collect()
    val scan = scans(one.queryExecution.executedPlan)
      .headOption.getOrElse(fail("no parquet scan over the bands table"))
    val totalFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$store/bands")).count(_.getName.endsWith(".parquet"))
    }
    assert(scan.metrics("numFiles").value < totalFiles,
      "bucket filter must prune band partitions at plan time")
    // append: new fingerprints join the store and pair on later probes
    Multimodal.appendToDHashStore(dHashes, store)
    val after = Multimodal.imageDeltaDupPairs(
        Multimodal.decodeDHash(spark,
          Seq((21L, ImageFixtures.png(520, 400))).toDF("id", "bytes")).toDF(),
        store, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(after.contains((11L, 21L)),
      s"appended fingerprints must become dedup targets: $after")
  }

  test("PngText: tEXt pairs in order, Latin-1, empty/corrupt contracts") {
    import graft.functions.PngText
    val texts = Seq("caption" -> "a café scene", "Author" -> "böb")
    val withText = ImageFixtures.pngWithText(6, 4, texts)
    assert(PngText.parse(withText).toSeq == texts,
      "pairs decode in file order with Latin-1 characters intact")
    // the tEXt insertion keeps the file a fully valid PNG
    assert(graft.functions.ImageMeta.parse(withText) == (("png", 6, 4, 8)))
    assert(PngText.parse(ImageFixtures.png(4, 4)).toSeq == Seq(),
      "a valid PNG without tEXt yields an empty list, not null")
    assert(PngText.parse(withText.take(30)) == null, "truncated mid-chunk → null")
    assert(PngText.parse("nope".getBytes("UTF-8")) == null)
    assert(PngText.parse(Array.empty[Byte]) == null)
    // unterminated keyword (no 0x00 in the tEXt data) is malformed
    val base = ImageFixtures.png(2, 2)
    val cut = 8 + 12 + 13
    val badChunk = {
      val out = new java.io.ByteArrayOutputStream()
      val data = "nokeyseparator".getBytes("ISO-8859-1")
      val crc = new java.util.zip.CRC32
      crc.update("tEXt".getBytes("US-ASCII")); crc.update(data)
      out.write(Array[Byte](0, 0, 0, data.length.toByte))
      out.write("tEXt".getBytes("US-ASCII")); out.write(data)
      out.write(Array(
        (crc.getValue >> 24).toByte, (crc.getValue >> 16).toByte,
        (crc.getValue >> 8).toByte, crc.getValue.toByte))
      out.toByteArray
    }
    val malformed = base.take(cut) ++ badChunk ++ base.drop(cut)
    assert(PngText.parse(malformed) == null)
  }
}
