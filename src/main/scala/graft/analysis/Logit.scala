package graft.analysis

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed logistic-regression training by Newton-Raphson (IRLS)
  * on one feature — the "train a quality classifier" step of an LLM
  * curation pipeline (the fastText-classifier pattern: label a slice,
  * fit P(keep | signal), gate the corpus on the score) in its
  * exactly-replayable form.
  *
  * Each Newton iteration is ONE aggregate over the feature frame: with
  * current round-6 coefficients (b0, b1),
  * `z = r6(b0 + b1·x)`, `p = r6(σ(z))`, `w = r6(p(1−p))`, and the five
  * sufficient statistics `Σ(y−p), Σ r6((y−p)x), Σ w, Σ r6(wx),
  * Σ r6(wx²)` accumulate as DECIMAL(38,12) sums of ≤6-dp addends
  * (exact and reduction-order free — the NB/Spectral pattern). The
  * 2×2 Newton solve `β += H⁻¹g` is a fixed double chain on the driver
  * (bounded model state, the Lloyd precedent), mirrored term-for-term
  * in the oracle, and coefficients re-round to 6 dp between
  * iterations so every pass starts from exactly-agreed state.
  *
  * Scale shape: `iters` aggregate jobs, each map-side combined; driver
  * state = 5 numbers; the model is 2 numbers. Scoring a corpus with
  * the fit is a per-row expression ([[scoreCol]]).
  */
object Logit {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Newton path over `feats` (columns `x` double, `y` 0/1): one row
    * per iteration `(iter, b0, b1)`, coefficients round-6. Starts at
    * (0, 0) — iteration 1's probabilities are exactly 0.5, so the
    * first step is the closed-form quarter-scaled least squares both
    * engines agree on. */
  def newtonPath(feats: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters >= 1: $iters")
    val spark = feats.sparkSession
    import spark.implicits._
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 12))
    var b0 = 0.0
    var b1 = 0.0
    val path = Seq.newBuilder[(Long, Double, Double)]
    for (it <- 1 to iters) {
      val z = round(lit(b0) + lit(b1) * col("x"), 6)
      val p = round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
      val w = round(p * (lit(1.0) - p), 6)
      val r: Row = feats.select(
        sum(dec(col("y").cast("double") - p)).as("g0"),
        sum(dec(round((col("y").cast("double") - p) * col("x"), 6))).as("g1"),
        sum(dec(w)).as("h00"),
        sum(dec(round(w * col("x"), 6))).as("h01"),
        sum(dec(round(w * col("x") * col("x"), 6))).as("h11"))
        .head()
      val Seq(g0, g1, h00, h01, h11) =
        (0 until 5).map(i => r.getDecimal(i).doubleValue())
      val det = h00 * h11 - h01 * h01
      require(math.abs(det) > 1e-12,
        s"degenerate Hessian at iteration $it (constant feature?)")
      b0 = r6(b0 + (h11 * g0 - h01 * g1) / det)
      b1 = r6(b1 + (h00 * g1 - h01 * g0) / det)
      path += ((it.toLong, b0, b1))
    }
    path.result().toDF("iter", "b0", "b1")
  }

  /** The fitted score `r6(σ(r6(b0 + b1·x)))` as a per-row column —
    * the gate a curation pipeline applies corpus-wide after training. */
  def scoreCol(x: org.apache.spark.sql.Column, b0: Double, b1: Double): org.apache.spark.sql.Column =
    round(lit(1.0) / (lit(1.0) + exp(-round(lit(b0) + lit(b1) * x, 6))), 6)

  /** Reliability (calibration) report of a fitted score over labeled
    * rows — the eval a probability-emitting gate needs before its
    * scores can THRESHOLD anything: scores bucket into `bins`
    * equal-width bins (the top edge folds into the last bin) and each
    * bin reports its count, DECIMAL-exact mean predicted probability,
    * and observed positive rate — well-calibrated ⇔ the two columns
    * track. One keyed reduce; bins-row output. */
  def calibration(feats: DataFrame, b0: Double, b1: Double,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins >= 2: $bins")
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 12))
    feats.select(col("y"), scoreCol(col("x"), b0, b1).as("s"))
      .withColumn("bucket",
        least(floor(col("s") * bins), lit((bins - 1).toLong)).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("s"))).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_pred"),
        round(sum(col("y")).cast("double") /
          count(lit(1)).cast("double"), 6).as("obs_rate"))
      .orderBy(col("bucket"))
  }
}
