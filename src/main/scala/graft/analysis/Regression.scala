package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed EXACT model fitting — closed-form least squares from
  * sufficient statistics, the "train a (small) model on 100 TB in one
  * pass" primitive: all nine second-order moments accumulate as
  * DECIMAL(38,12)-cast addends (associative — reduction-order free,
  * the Spectral/Zipf pattern), so the normal equations see
  * bit-identical inputs on every engine and the solved coefficients
  * replay exactly. Iterative trainers (the Lloyd family) converge on
  * model STATE; this one needs no iterations at all — the moments ARE
  * the model.
  */
object Regression {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 12))

  /** Two-feature OLS with intercept, solved by Cramer's rule on the
    * 3×3 normal equations, plus R² from the same moments (one corpus
    * pass, nine sums of driver model state). Degenerate inputs
    * (singular system, zero target variance) yield an all-zero
    * coefficient row with `ok = 0` rather than a division artifact
    * (under ANSI even a double divide-by-zero throws).
    *
    * @return one row `(n, b0, b1, b2, r2, ok)`, round-6 floats
    */
  def olsTwo(df: DataFrame, y: Column, x1: Column, x2: Column): DataFrame = {
    val m = df.select(y.as("y"), x1.as("x1"), x2.as("x2"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(col("x1"))).cast("double").as("sx1"),
        sum(dec(col("x2"))).cast("double").as("sx2"),
        sum(dec(col("y"))).cast("double").as("sy"),
        sum(dec(col("x1") * col("x1"))).cast("double").as("sx11"),
        sum(dec(col("x1") * col("x2"))).cast("double").as("sx12"),
        sum(dec(col("x2") * col("x2"))).cast("double").as("sx22"),
        sum(dec(col("x1") * col("y"))).cast("double").as("sx1y"),
        sum(dec(col("x2") * col("y"))).cast("double").as("sx2y"),
        sum(dec(col("y") * col("y"))).cast("double").as("syy"))
      .head()
    val Seq(n, sx1, sx2, sy, sx11, sx12, sx22, sx1y, sx2y, syy) =
      (0 until 10).map(m.getDouble)
    // Cramer on [[n,sx1,sx2],[sx1,sx11,sx12],[sx2,sx12,sx22]] b = rhs;
    // keep the EXACT parenthesization — the oracle repeats it verbatim
    val det = n * (sx11 * sx22 - sx12 * sx12) -
      sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2)
    val sst = syy - sy * sy / n
    val spark = df.sparkSession
    import spark.implicits._
    if (det == 0.0 || sst <= 0.0) {
      Seq((n.toLong, 0.0, 0.0, 0.0, 0.0, 0L))
        .toDF("n", "b0", "b1", "b2", "r2", "ok")
    } else {
      val b0 = (sy * (sx11 * sx22 - sx12 * sx12) -
        sx1 * (sx1y * sx22 - sx12 * sx2y) +
        sx2 * (sx1y * sx12 - sx11 * sx2y)) / det
      val b1 = (n * (sx1y * sx22 - sx12 * sx2y) -
        sy * (sx1 * sx22 - sx12 * sx2) +
        sx2 * (sx1 * sx2y - sx1y * sx2)) / det
      val b2 = (n * (sx11 * sx2y - sx1y * sx12) -
        sx1 * (sx1 * sx2y - sx1y * sx2) +
        sy * (sx1 * sx12 - sx11 * sx2)) / det
      val ssr = b1 * (sx1y - sx1 * sy / n) + b2 * (sx2y - sx2 * sy / n)
      def r6(x: Double) = graft.vector.VectorOps.round6(x)
      Seq((n.toLong, r6(b0), r6(b1), r6(b2), r6(ssr / sst), 1L))
        .toDF("n", "b0", "b1", "b2", "r2", "ok")
    }
  }
}
