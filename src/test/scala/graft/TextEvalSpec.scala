package graft

import graft.text.TextEval

/** Hand-computed BLEU-2 pins: clipping, brevity penalty, and the
  * degenerate conventions. */
class TextEvalSpec extends SparkSpec {
  import spark.implicits._

  private def r6(v: Double) =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rougeL: hand LCS cases — identity, subsequence, reorder, disjoint, empty") {
    import org.apache.spark.sql.functions.col
    val pairs = Seq(
      (1L, "a b c d", "a b c d"),      // identical: lcs 4, p=r=f=1
      (2L, "a c", "a b c d"),          // subsequence: lcs 2, p 1, r 0.5
      (3L, "d c b a", "a b c d"),      // full reversal: lcs 1
      (4L, "x y z", "a b c d"),        // disjoint: 0 everywhere
      (5L, "", "a b")                  // empty candidate: 0, no div-by-0
    ).toDF("id", "cand", "ref")
    val got = graft.text.TextEval.rougeL(pairs, "id", "cand", "ref")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got(1L) == ((4L, 1.0, 1.0, 1.0)))
    assert(got(2L) == ((2L, 1.0, 0.5, r6(2.0 * 1.0 * 0.5 / 1.5))))
    assert(got(3L)._1 == 1L)
    assert(got(4L) == ((0L, 0.0, 0.0, 0.0)))
    assert(got(5L) == ((0L, 0.0, 0.0, 0.0)))
  }

  test("clipped precisions and the ln/exp chain match the hand computation") {
    // cand "a a b" vs ref "a b b": p1 = (min(2,1)+min(1,1))/3 = 2/3,
    // p2 = (0 + min(1,1))/2 = 1/2, equal lengths → bp = 1
    val pairs = Seq((1L, "a a b", "a b b")).toDF("id", "cand", "ref")
    val r = TextEval.bleu2(pairs, "id", "cand", "ref").head()
    assert(r.getDouble(1) == r6(2.0 / 3) && r.getDouble(2) == 0.5,
      s"precisions ${r.getDouble(1)}, ${r.getDouble(2)}")
    assert(r.getDouble(3) == 1.0, "equal lengths carry no brevity penalty")
    val want = r6(1.0 * math.exp((math.log(r6(2.0 / 3)) + math.log(0.5)) / 2.0))
    assert(r.getDouble(4) == want, s"bleu ${r.getDouble(4)} vs $want")
  }

  test("identical texts score 1; disjoint texts score 0; short cand pays BP") {
    val pairs = Seq(
      (1L, "x y z w", "x y z w"),
      (2L, "p q", "r s"),
      (3L, "x y", "x y z w")).toDF("id", "cand", "ref")
    val out = TextEval.bleu2(pairs, "id", "cand", "ref")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((1.0, 1.0, 1.0, 1.0)))
    assert(out(2L)._4 == 0.0, "no shared gram → BLEU 0, never ln(0)")
    // cand 3 is a perfect prefix: p1 = p2 = 1, bp = e^(1 - 4/2)
    assert(out(3L)._1 == 1.0 && out(3L)._2 == 1.0)
    assert(out(3L)._3 == r6(math.exp(1.0 - 4.0 / 2.0)))
    assert(out(3L)._4 == r6(out(3L)._3 * 1.0))
  }
}
