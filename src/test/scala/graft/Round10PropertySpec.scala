package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the round-10 kernels that have pure-JVM reference
  * implementations: Morton interleave (injective on the grid,
  * recoverable by de-interleave) and the BPE greedy merge fold
  * (equivalent to a straightforward scan-based reference on random
  * symbol strings). Spark-side equality with these same functions is
  * pinned separately in ZOrderSpec / BpeSpec; here ScalaCheck drives
  * the ALGORITHms over hundreds of generated cases without a session. */
class Round10PropertySpec extends AnyFunSuite {

  private def passes(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  // JVM mirror of ZOrder.zValue (same formula, plain longs)
  private def z(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { b =>
      (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }.sum

  test("morton code is injective on the grid and de-interleaves back") {
    val gen = for {
      bits <- Gen.choose(1, 20)
      x <- Gen.choose(0L, (1L << bits) - 1)
      y <- Gen.choose(0L, (1L << bits) - 1)
    } yield (bits, x, y)
    passes(Prop.forAll(gen) { case (bits, x, y) =>
      val zv = z(x, y, bits)
      val xBack = (0 until bits).map(b => ((zv >> (2 * b)) & 1L) << b).sum
      val yBack = (0 until bits).map(b => ((zv >> (2 * b + 1)) & 1L) << b).sum
      xBack == x && yBack == y
    })
  }

  test("morton code preserves per-dimension order within a fixed other dim") {
    val gen = for {
      bits <- Gen.choose(1, 20)
      x1 <- Gen.choose(0L, (1L << bits) - 1)
      x2 <- Gen.choose(0L, (1L << bits) - 1)
      y <- Gen.choose(0L, (1L << bits) - 1)
    } yield (bits, x1, x2, y)
    passes(Prop.forAll(gen) { case (bits, x1, x2, y) =>
      (x1 < x2) == (z(x1, y, bits) < z(x2, y, bits)) || x1 == x2
    })
  }

  // reference greedy single-scan merge (Sennrich's algorithm, lists)
  private def refMerge(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  // JVM mirror of the fold in Bpe.applyMerge / the oracle's list_reduce
  private def foldMerge(syms: List[String], l: String, r: String): List[String] = {
    val acc = syms.foldLeft("|") { (acc, x) =>
      if (x == r && acc.endsWith("|" + l + "|"))
        acc.substring(0, acc.length - l.length - 1) + l + r + "|"
      else acc + x + "|"
    }
    acc.split("\\|").filter(_.nonEmpty).toList
  }

  test("AVI walker total on arbitrary bytes: parses or rejects, never hangs/throws") {
    // drive the same chunk walk the executor runs, over random byte
    // soups seeded with RIFF/AVI magics so the walker actually enters
    // its loops (pure random bytes die at the magic check)
    val gen = for {
      seed <- org.scalacheck.Gen.listOfN(80, org.scalacheck.Gen.chooseNum(-128, 127))
      riff <- org.scalacheck.Gen.oneOf(true, false)
    } yield {
      val bytes = seed.map(_.toByte).toArray
      if (riff && bytes.length >= 12) {
        "RIFF".getBytes("US-ASCII").copyToArray(bytes, 0)
        "AVI ".getBytes("US-ASCII").copyToArray(bytes, 8)
      }
      bytes
    }
    passes(Prop.forAll(gen) { bytes =>
      // the property is termination + no throw on the hostile-input
      // space; field-exact parsing on VALID files is VideoSpec's job
      val f = scala.concurrent.Future {
        graft.multimodal.Multimodal.parseAvi(bytes); true
      }(scala.concurrent.ExecutionContext.global)
      scala.concurrent.Await.result(f, scala.concurrent.duration.Duration(10, "s"))
    })
  }

  test("BPE fold merge ≡ reference greedy scan on random symbol strings") {
    val sym = Gen.oneOf("a", "b", "ab", "aa", "c")
    val gen = for {
      syms <- Gen.listOfN(12, sym)
      l <- sym
      r <- sym
    } yield (syms, l, r)
    passes(Prop.forAll(gen) { case (syms, l, r) =>
      foldMerge(syms, l, r) == refMerge(syms, l, r)
    })
  }

  test("BpeEncode kernel ≡ sequential greedy folds over random words and merge tables") {
    // the round-11 native encode expression's JVM kernel, driven
    // directly (no session): applying a whole random merge TABLE must
    // equal folding each merge in rank order with the reference fold —
    // including merges whose sides are earlier merges' outputs
    val piece = Gen.oneOf("a", "b", "c", "aa", "ab", "ba", "abc")
    val genWord = Gen.listOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val genMerges = Gen.listOfN(6, for { l <- piece; r <- piece } yield (l, r))
    passes(Prop.forAll(for { w <- genWord; ms <- genMerges } yield (w, ms)) {
      case (w, ms) =>
        val got = graft.functions.BpeEncode
          .encode(org.apache.spark.unsafe.types.UTF8String.fromString(w),
            ms.map(_._1).toArray, ms.map(_._2).toArray)
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString).toList
        val ref = ms.foldLeft(w.map(_.toString).toList) {
          case (s, (l, r)) => foldMerge(s, l, r)
        }
        got == ref
    })
  }
}
