package graft

import org.apache.spark.sql.functions._

import graft.analysis.Diversity

/** Diversity gates: closed-form Zipf regression, distinct-n counting,
  * and entropy arithmetic incl. the degenerate-vocabulary guard. */
class DiversitySpec extends SparkSpec {
  import spark.implicits._

  test("zipfSlope: two-point regression matches the closed form") {
    // term 'aa' 100×, term 'bb' 10× → ranks 1, 2
    val docs = Seq(
      (1L, Seq.fill(100)("aa").mkString(" ")),
      (2L, Seq.fill(10)("bb").mkString(" "))
    ).toDF("doc_id", "text")
    val r = Diversity.zipfSlope(docs, "text", 10).head()
    def r6(x: Double) = graft.vector.VectorOps.round6(x)
    val x1 = r6(math.log(1.0)); val y1 = r6(math.log(100.0))
    val x2 = r6(math.log(2.0)); val y2 = r6(math.log(10.0))
    val slope = (y2 - y1) / (x2 - x1)
    assert(r.getLong(0) == 2L)
    assert(math.abs(r.getDouble(1) - r6(slope)) < 1e-6,
      s"slope ${r.getDouble(1)} vs ${r6(slope)}")
    // intercept: y at ln(rank)=0 is rank-1's y exactly
    assert(math.abs(r.getDouble(2) - y1) < 1e-5,
      s"intercept ${r.getDouble(2)} vs $y1")
  }

  test("distinctNgramRatio counts repeated trigrams once") {
    // tokens x y z x y z → trigrams xyz yzx zxy xyz: 4 total, 3 distinct
    val docs = Seq(("s1", "x y z x y z"), ("s2", "p q r s")).toDF("src", "text")
    val out = Diversity.distinctNgramRatio(docs, "src", "text", 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("s1") == ((4L, 3L, 0.75)), s"got ${out("s1")}")
    assert(out("s2") == ((2L, 2L, 1.0)), s"got ${out("s2")}")
  }

  test("termEntropy: uniform two-token source hits ln2 and norm 1; singleton norms to 0") {
    val docs = Seq(("u", "aa bb aa bb"), ("one", "zz zz zz")).toDF("src", "text")
    val out = Diversity.termEntropy(docs, "src", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val (v, h, nh) = out("u")
    assert(v == 2L && math.abs(h - math.log(2.0)) < 1e-6 && nh == 1.0)
    val (v1, h1, nh1) = out("one")
    assert(v1 == 1L && h1 == 0.0 && nh1 == 0.0,
      "a single-token vocabulary must entropy 0 and norm 0, not NaN")
  }
}
