package graft

import org.apache.spark.sql.functions._

import graft.analysis.Logit

/** Newton-path logistic regression: the closed-form first step from
  * (0,0), direction of fit, and the scoring column. */
class LogitSpec extends SparkSpec {
  import spark.implicits._

  private def r6(v: Double) =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("first Newton step from (0,0) is the closed-form quarter-scaled solve") {
    val rows = Seq((0.1, 0), (0.2, 0), (0.3, 1), (0.4, 1), (0.5, 1))
    val feats = rows.toDF("x", "y")
    val out = Logit.newtonPath(feats, 1).head()
    // at beta = 0: p = 0.5, w = 0.25 for every row
    val g0 = rows.map { case (_, y) => y - 0.5 }.sum
    val g1 = rows.map { case (x, y) => r6((y - 0.5) * x) }.sum
    val h00 = rows.size * 0.25
    val h01 = rows.map { case (x, _) => r6(0.25 * x) }.sum
    val h11 = rows.map { case (x, _) => r6(0.25 * x * x) }.sum
    val det = h00 * h11 - h01 * h01
    val b0 = r6((h11 * g0 - h01 * g1) / det)
    val b1 = r6((h00 * g1 - h01 * g0) / det)
    assert(out.getDouble(1) == b0 && out.getDouble(2) == b1,
      s"got (${out.getDouble(1)}, ${out.getDouble(2)}) vs hand ($b0, $b1)")
    // y increases with x on this fixture — the slope must be positive
    assert(b1 > 0.0)
  }

  test("iterating sharpens a separable fit; scoreCol is the fitted sigmoid") {
    val feats = ((1 to 20).map(i => (i / 10.0, if (i > 10) 1 else 0)))
      .toDF("x", "y")
    val path = Logit.newtonPath(feats, 3)
      .orderBy("iter").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    // Newton on a separable 1-D problem grows the slope every step
    assert(path(1)._2 > path(0)._2 && path(2)._2 > path(1)._2,
      s"slope must sharpen: ${path.toSeq}")
    val (b0, b1) = path.last
    val scores = feats.select(col("x"), Logit.scoreCol(col("x"), b0, b1).as("s"))
      .orderBy("x").collect().map(_.getDouble(1))
    assert(scores.sliding(2).forall { case Array(a, b) => a <= b },
      "a positive-slope fit scores monotonically in x")
    assert(scores.head < 0.5 && scores.last > 0.5)
  }

  test("a constant feature fails loudly, not with a silent NaN fit") {
    val feats = Seq((1.0, 0), (1.0, 1), (1.0, 1)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Logit.newtonPath(feats, 1).collect()
    }
    assert(e.getMessage.contains("degenerate"))
  }
}
