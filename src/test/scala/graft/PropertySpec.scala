package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CharEntropy, ChunkText, ImageMeta}
import graft.multimodal.ImageFixtures

/** Property-based pins for the round-8 kernels — pure JVM evaluation
  * (expressions over Literal children), no Spark session, so hundreds
  * of generated cases run in milliseconds. */
class PropertySpec extends AnyFunSuite {

  private def passes(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private def chunksOf(s: String, size: Int, overlap: Int): Seq[(Int, String)] =
    ChunkText(Literal.create(UTF8String.fromString(s), StringType), size, overlap)
      .eval(null).iterator.map { r =>
        (r.getInt(0), r.getUTF8String(1).toString)
      }.toSeq

  test("chunk_text: windows reconstruct the input for any size/overlap") {
    val gen = for {
      s <- Gen.asciiPrintableStr
      size <- Gen.choose(2, 40)
      overlap <- Gen.choose(0, size - 1)
    } yield (s, size, overlap)
    passes(Prop.forAll(gen) { case (s, size, overlap) =>
      val stride = size - overlap
      val ch = chunksOf(s, size, overlap)
      if (s.isEmpty) ch.isEmpty
      else {
        val posOk = ch.map(_._1) == (0 until s.length by stride)
        val lenOk = ch.forall(_._2.length <= size)
        // all but the last window contribute their first `stride` chars;
        // the last contributes itself — sliding windows reconstruct s
        val rebuilt = ch.dropRight(1).map(_._2.take(stride)).mkString + ch.last._2
        posOk && lenOk && rebuilt == s
      }
    })
  }

  test("image_meta: fixture roundtrip for any dimensions, all three formats") {
    val gen = for {
      w <- Gen.choose(1, 300)
      h <- Gen.choose(1, 300)
    } yield (w, h)
    passes(Prop.forAll(gen) { case (w, h) =>
      ImageMeta.parse(ImageFixtures.png(w, h)) == ("png", w, h, 8) &&
        ImageMeta.parse(ImageFixtures.jpeg(w, h)) == ("jpeg", w, h, 8) &&
        ImageMeta.parse(ImageFixtures.jpeg(w, h, precision = 12, sof = 0xc2)) ==
          ("jpeg", w, h, 12) &&
        ImageMeta.parse(ImageFixtures.gif(w, h)) == ("gif", w, h, 8)
    })
  }

  test("image_meta: arbitrary bytes never throw — null or a well-formed tuple") {
    passes(Prop.forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      ImageMeta.parse(bytes) match {
        case null => true
        case (f, w, h, d) =>
          Set("png", "jpeg", "gif").contains(f) && w > 0 && h > 0 && d >= 0
      }
    })
  }

  test("image_meta: any truncation of a valid file is null or consistent metadata") {
    val full = ImageFixtures.png(40, 30)
    passes(Prop.forAll(Gen.choose(0, full.length - 1)) { n =>
      ImageMeta.parse(full.take(n)) match {
        case null => true
        case parsed => parsed == ("png", 40, 30, 8) // header fully present
      }
    })
  }

  test("char_entropy: 0 <= H <= ln(distinct code points) for any string") {
    passes(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val v = CharEntropy(Literal.create(UTF8String.fromString(s), StringType))
        .eval(null).asInstanceOf[Double]
      val distinct = s.codePoints().distinct().count()
      val bound = if (distinct == 0) 0.0 else math.log(distinct.toDouble)
      v >= 0.0 && v <= bound + 1e-9 &&
        (1.0 / v != Double.NegativeInfinity) // never -0.0
    })
  }

  test("sampling bucket: split-multiply equals BigInt ground truth for any id") {
    val M = BigInt(1) << 32
    passes(Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { id =>
      // the overflow-free split-multiply (Sampling.bucket) vs exact math
      val r = BigInt(id).mod(M)
      val want = (r * BigInt(2654435761L)).mod(M).toLong
      val hi = (r >> 16).toLong
      val lo = (r & 0xFFFF).toLong
      val got = Math.floorMod(
        Math.floorMod(hi * 2654435761L, 1L << 32) * (1L << 16) + lo * 2654435761L,
        1L << 32)
      got == want
    })
  }
}
