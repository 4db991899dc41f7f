package graft

import org.apache.spark.sql.functions._

import graft.analysis.Regression

/** Closed-form OLS: exact recovery of a planted linear law, and the
  * degenerate-system guards. */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("olsTwo recovers a planted linear law exactly (r2 = 1)") {
    // y = 2 + 3·x1 − 0.5·x2 on non-collinear points
    val pts = Seq((1.0, 1.0), (2.0, 5.0), (3.0, 2.0), (4.0, 7.0), (5.0, 3.0))
      .map { case (x1, x2) => (2.0 + 3.0 * x1 - 0.5 * x2, x1, x2) }
      .toDF("y", "x1", "x2")
    val r = Regression.olsTwo(pts, col("y"), col("x1"), col("x2")).head()
    assert(r.getLong(5) == 1L)
    assert(math.abs(r.getDouble(1) - 2.0) < 1e-5, s"b0 ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 3.0) < 1e-5, s"b1 ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) + 0.5) < 1e-5, s"b2 ${r.getDouble(3)}")
    assert(r.getDouble(4) == 1.0, s"r2 ${r.getDouble(4)}")
  }

  test("degenerate systems surface ok = 0, never a division artifact") {
    // collinear features: x2 = 2·x1 → singular normal equations
    val collinear = Seq((1.0, 1.0, 2.0), (2.0, 2.0, 4.0), (3.0, 3.0, 6.0))
      .toDF("y", "x1", "x2")
    assert(Regression.olsTwo(collinear, col("y"), col("x1"), col("x2"))
      .head().getLong(5) == 0L)
    // constant target: zero variance to explain
    val flat = Seq((1.0, 1.0, 5.0), (1.0, 2.0, 3.0), (1.0, 4.0, 9.0))
      .toDF("y", "x1", "x2")
    assert(Regression.olsTwo(flat, col("y"), col("x1"), col("x2"))
      .head().getLong(5) == 0L)
  }

  test("moments are partitioning-invariant (decimal sums)") {
    val pts = (1 to 200).map(i => (i * 0.1 + 3.0, i * 1.0, (i % 7) * 1.0))
      .toDF("y", "x1", "x2")
    val one = Regression.olsTwo(pts.coalesce(1), col("y"), col("x1"), col("x2"))
      .head().toSeq
    val many = Regression.olsTwo(pts.repartition(16), col("y"), col("x1"), col("x2"))
      .head().toSeq
    assert(one == many, s"$one vs $many")
  }
}
