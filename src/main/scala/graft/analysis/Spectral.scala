package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.vector.VectorOps

/** Spectral diagnostics of an embedding column — the top principal
  * direction by matrix-free power iteration, and the share of total
  * (uncentered) variance it carries.
  *
  * Why an engine needs this: embedding spaces are notoriously
  * ANISOTROPIC — a handful of rogue directions can carry most of the
  * energy, which collapses cosine contrast and quietly degrades every
  * retrieval operator built on it (a published, well-known failure
  * mode of sentence/LLM embeddings). `spectral_share` is the one-row
  * alarm: a share near 1/d is healthy isotropy, a share of 0.5+ says
  * the space needs whitening/centering before the ANN indexes are
  * trusted. Power iteration needs only `Σ_x x (x·v)` per step — no
  * d×d covariance is ever materialized, so d can be thousands.
  *
  * Cross-engine determinism (this is the interesting part): the
  * per-dimension cross-ROW sums are the one place reduction order
  * could leak in, so each addend is cast to `DECIMAL(38,12)` and
  * summed EXACTLY — decimal addition is associative, making the sum
  * order-free and bit-identical on any engine; the per-row dot
  * products and the driver-side norm fold are fixed-sequence IEEE
  * (the `list_dot_product` parity the cosine kernels already pin).
  * Only the final reported scalars round to 6.
  *
  * Scale shape: `iters` scans, each one explode + keyed sum to d rows
  * (map-side combined); the direction vector is d doubles of driver
  * model state between iterations (the Lloyd-centroid pattern).
  * Deterministic init: the uniform unit vector (no randomness to
  * seed-sync across engines); it converges to the top eigenvector
  * whenever that is not orthogonal to it — generic data satisfies
  * this.
  */
object Spectral {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 12))

  /** One matrix-free step `X'(Xv)` as driver model state: per-dim
    * DECIMAL(38,12)-exact sums, ascending-dim order. The d sums run as
    * d aggregate COLUMNS of one scan (row stays a row) rather than a
    * posexplode + d-group shuffle: decimal addition is exact and
    * order-free, so regrouping the identical addend set cannot change
    * a bit of the result — but it drops the d× row blowup and the
    * shuffle from every power iteration, and this runs `iters` times
    * per chain. */
  private def xtxv(df: DataFrame, vecCol: String, v: Seq[Double]): Seq[Double] = {
    val staged = df.select(col(vecCol).as("__v"),
      VectorOps.dot(col(vecCol), typedlit(v)).as("__d"))
    val sums = v.indices.map(j =>
      sum(dec(element_at(col("__v"), j + 1).cast("double") * col("__d")))
        .as(s"s$j"))
    val row = staged.agg(sums.head, sums.tail: _*).head()
    // sum over zero rows is NULL in every dim — fail with the real
    // cause, not an NPE from inside a power iteration
    require(!row.isNullAt(0),
      "power iteration over an empty frame: X'Xv needs at least one row")
    v.indices.map(j => row.getDecimal(j).doubleValue())
  }

  /** The power-iterated direction after `iters` steps, as driver-side
    * model state. */
  def topDirection(df: DataFrame, vecCol: String, dim: Int,
                   iters: Int): Seq[Double] = {
    require(dim >= 2 && iters >= 1, "need dim >= 2, iters >= 1")
    var v: Seq[Double] = Seq.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    (1 to iters).foreach { _ =>
      val s = xtxv(df, vecCol, v)
      val norm = math.sqrt(s.map(x => x * x).sum)
      v = s.map(_ / norm)
    }
    v
  }

  /** The SECOND principal direction by DEFLATED power iteration:
    * every step re-orthogonalizes against the recorded top direction
    * (classic Hotelling deflation, matrix-free — no d×d covariance
    * ever materialized), so the iterate converges inside v1's
    * orthogonal complement. All folds (Gram-Schmidt dot, subtraction,
    * normalization) run in ascending-dim order over the decimal-exact
    * per-dim sums — the whole second chain replays in SQL like the
    * first. */
  def secondDirection(df: DataFrame, vecCol: String, dim: Int,
                      iters: Int, v1: Seq[Double]): Seq[Double] = {
    require(v1.length == dim, "v1 must have length dim")
    def orthNorm(s: Seq[Double]): Seq[Double] = {
      val d = s.zip(v1).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
      val o = s.zip(v1).map { case (x, y) => x - d * y }
      val n = math.sqrt(o.map(x => x * x).sum)
      o.map(_ / n)
    }
    var w = orthNorm(Seq.fill(dim)(1.0 / math.sqrt(dim.toDouble)))
    (1 to iters).foreach(_ => w = orthNorm(xtxv(df, vecCol, w)))
    w
  }

  /** One-row spectral report: `var_share` = Σ(x·v)² / Σ‖x‖² (round-6),
    * `top_dim` = the coordinate with the largest |weight| in the
    * direction (lowest index on ties), `top_weight` its round-6
    * value. */
  def spectralShare(df: DataFrame, vecCol: String, dim: Int,
                    iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = topDirection(df, vecCol, dim, iters)
    val d = VectorOps.dot(col(vecCol), typedlit(v))
    val num = df.agg(sum(dec(d * d)).as("a")).head().getDecimal(0).doubleValue()
    val den = df.select(explode(col(vecCol)).as("x"))
      .select(col("x").cast("double").as("x"))
      .agg(sum(dec(col("x") * col("x"))).as("b"))
      .head().getDecimal(0).doubleValue()
    val topDim = v.indices.maxBy(j => (math.abs(v(j)), -j))
    Seq((VectorOps.round6(num / den), topDim.toLong,
      VectorOps.round6(v(topDim))))
      .toDF("var_share", "top_dim", "top_weight")
  }

  /** Two-direction spectral report: variance shares of the top
    * direction AND the deflated second direction, plus their ratio —
    * the spectrum-shape gate a single share can't see (share1 ≈
    * share2 = a rotated isotropic cloud; share1 ≫ share2 = one
    * dominant axis crushing cosine contrast). */
  def spectralTop2(df: DataFrame, vecCol: String, dim: Int,
                   iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v1 = topDirection(df, vecCol, dim, iters)
    val v2 = secondDirection(df, vecCol, dim, iters, v1)
    def numOf(v: Seq[Double]): Double = {
      val d = VectorOps.dot(col(vecCol), typedlit(v))
      df.agg(sum(dec(d * d)).as("a")).head().getDecimal(0).doubleValue()
    }
    val den = df.select(explode(col(vecCol)).as("x"))
      .select(col("x").cast("double").as("x"))
      .agg(sum(dec(col("x") * col("x"))).as("b"))
      .head().getDecimal(0).doubleValue()
    val s1 = numOf(v1) / den
    val s2 = numOf(v2) / den
    Seq((VectorOps.round6(s1), VectorOps.round6(s2),
      VectorOps.round6(s1 / s2)))
      .toDF("share_1", "share_2", "anisotropy_ratio")
  }

  /** Per-dimension (mean, std) model state from DECIMAL-exact moments
    * — the diagonal-whitening statistics. Zero-variance dimensions
    * carry sd = 1 (whitening must not divide by zero and an exactly
    * constant coordinate carries no signal either way). */
  def dimStats(df: DataFrame, vecCol: String): (Seq[Double], Seq[Double]) = {
    val rows = df
      .select(posexplode(col(vecCol)).as(Seq("j", "x")))
      .select(col("j"), col("x").cast("double").as("x"))
      .groupBy(col("j"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(dec(col("x"))).cast("double").as("sx"),
        sum(dec(col("x") * col("x"))).cast("double").as("sxx"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val mu = rows.map(t => t._3 / t._2).toSeq
    val sd = rows.map { t =>
      val v = (t._4 - t._3 * t._3 / t._2) / t._2
      if (v <= 0.0) 1.0 else math.sqrt(v)
    }.toSeq
    (mu, sd)
  }

  /** EMBEDDING-DRIFT gate between two corpus slices: cosine between
    * the slices' MEAN vectors (the centroid-shift scalar an embedding
    * refresh / re-crawl is judged by — [[graft.analysis.CorpusDrift]]
    * covers tokens and numerics; this is the vector modality). Per-dim
    * means accumulate as DECIMAL(38,12) (order-free), the cosine folds
    * ascending-dim driver-side — one replayable IEEE chain. Zero-norm
    * means (a slice of zero vectors) yield cosine 0 explicitly.
    *
    * @return one row `(n_a, n_b, centroid_cosine)` round-6
    */
  def centroidDrift(a: DataFrame, b: DataFrame, vecCol: String): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    def meanVec(df: DataFrame): (Long, Seq[Double]) = {
      val rows = df
        .select(posexplode(col(vecCol)).as(Seq("j", "x")))
        .groupBy(col("j"))
        .agg(count(lit(1)).as("n"), sum(dec(col("x").cast("double"))).as("s"))
        .collect()
      val n = if (rows.isEmpty) 0L else rows.head.getLong(1)
      (n, rows.map(r => r.getInt(0) ->
        (r.getDecimal(2).doubleValue() / r.getLong(1))).sortBy(_._1).map(_._2).toSeq)
    }
    val (na, ma) = meanVec(a)
    val (nb, mb) = meanVec(b)
    val dot = ma.zip(mb).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    val nna = math.sqrt(ma.foldLeft(0.0)((acc, x) => acc + x * x))
    val nnb = math.sqrt(mb.foldLeft(0.0)((acc, x) => acc + x * x))
    val cos = if (nna == 0.0 || nnb == 0.0) 0.0 else dot / (nna * nnb)
    Seq((na, nb, VectorOps.round6(cos)))
      .toDF("n_a", "n_b", "centroid_cosine")
  }

  /** EFFECTIVE-DIMENSIONALITY report via the participation ratio of
    * the per-coordinate variances, `PR = (Σv_j)² / Σv_j²` ∈ [1, d] —
    * d when variance spreads evenly, → 1 when one coordinate carries
    * everything. This is the DIAGONAL approximation (no rotation —
    * [[spectralShare]] measures the rotated top direction; together
    * they bracket the anisotropy story) and costs one scan + a d-row
    * reduce. Per-dim Σx / Σx² accumulate as DECIMAL(38,12); both PR
    * folds run in ascending-dimension order, making the scalar a
    * replayable IEEE sequence.
    *
    * @return one row `(n_dims, effective_dim, top_var_dim,
    *         top_var_share)` — the highest-variance coordinate
    *         (lowest index on ties) and its share of total variance
    */
  def effectiveDim(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val perDim = df
      .select(posexplode(col(vecCol)).as(Seq("j", "x")))
      .select(col("j"), col("x").cast("double").as("x"))
      .groupBy(col("j"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(dec(col("x"))).cast("double").as("sx"),
        sum(dec(col("x") * col("x"))).cast("double").as("sxx"))
      .collect()
      .map(r => r.getInt(0) -> {
        val n = r.getDouble(1); val sx = r.getDouble(2); val sxx = r.getDouble(3)
        (sxx - sx * sx / n) / n
      })
      .sortBy(_._1)
    val vars = perDim.map(_._2)
    val sv = vars.foldLeft(0.0)(_ + _)
    val svv = vars.foldLeft(0.0)((a, x) => a + x * x)
    val top = vars.indices.maxBy(j => (vars(j), -j))
    Seq((vars.length.toLong, VectorOps.round6(sv * sv / svv), top.toLong,
      VectorOps.round6(vars(top) / sv)))
      .toDF("n_dims", "effective_dim", "top_var_dim", "top_var_share")
  }
}
