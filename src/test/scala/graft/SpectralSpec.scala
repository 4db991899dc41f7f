package graft

import org.apache.spark.sql.functions._

import graft.analysis.Spectral

/** Power-iteration spectral diagnostics: recovers a planted dominant
  * direction, is partition-order invariant (the DECIMAL-exact
  * cross-row sum claim), and mirrors a driver-side replica of its own
  * arithmetic. */
class SpectralSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("a planted dominant axis is recovered with its energy share") {
    // 50 vectors hugging e0 (±10) + 10 small orthogonal ones along e1
    val rows =
      (0 until 50).map(i => Seq(if (i % 2 == 0) 10.0f else -10.0f, 0.1f, 0f, 0f)) ++
        (0 until 10).map(_ => Seq(0f, 1.0f, 0f, 0f))
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val out = Spectral.spectralShare(df, "vec", 4, 5).head()
    assert(out.getAs[Long]("top_dim") == 0L, s"got $out")
    // e0 carries 5000 of 5010.5 total energy → share ≈ 0.998
    assert(out.getAs[Double]("var_share") > 0.99 && out.getAs[Double]("var_share") <= 1.0)
    assert(math.abs(math.abs(out.getAs[Double]("top_weight")) - 1.0) < 0.02)
  }

  test("partition-order invariant: 1 vs 16 partitions, bit-identical") {
    val a = Spectral.spectralShare(emb.coalesce(1), "embedding", 64, 3).head()
    val b = Spectral.spectralShare(emb.repartition(16), "embedding", 64, 3).head()
    assert(a == b, s"$a vs $b — decimal sums must be order-free")
  }

  test("share is a valid Rayleigh fraction and beats the isotropic floor") {
    val out = Spectral.spectralShare(emb, "embedding", 64, 3).head()
    val share = out.getAs[Double]("var_share")
    // the top direction can never carry less than the 1/d average
    assert(share > 1.0 / 64 && share <= 1.0, s"share $share")
  }

  test("spectralTop2: recovers both planted axes, orthogonal, shares ordered") {
    import spark.implicits._
    // energy concentrated on axes 0 (heavy) and 2 (lighter)
    val vecs = Seq(
      Seq(10.0f, 0f, 3.0f, 0f), Seq(-10.0f, 0f, 3.0f, 0f),
      Seq(10.0f, 0f, -3.0f, 0f), Seq(-10.0f, 0f, -3.0f, 0f))
      .map(Tuple1(_)).toDF("embedding")
    val v1 = Spectral.topDirection(vecs, "embedding", 4, 8)
    val v2 = Spectral.secondDirection(vecs, "embedding", 4, 8, v1)
    assert(math.abs(v1(0)) > 0.99, s"v1 must find axis 0: $v1")
    assert(math.abs(v2(2)) > 0.99, s"v2 must find axis 2: $v2")
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-9, s"deflation must keep v2 ⊥ v1, dot=$dot")
    val r = Spectral.spectralTop2(vecs, "embedding", 4, 8).head()
    // total energy 4·(100+9)=436; axis0 carries 400/436, axis2 36/436
    assert(math.abs(r.getDouble(0) - 400.0 / 436) < 1e-4, r.toString)
    assert(math.abs(r.getDouble(1) - 36.0 / 436) < 1e-4, r.toString)
    assert(r.getDouble(2) > 10.0, "anisotropy ratio must reflect the 100:9 split")
  }

  test("dimStats: closed-form means/stds, zero-variance dims carry sd 1") {
    import spark.implicits._
    val vecs = Seq(Seq(1.0f, 7.0f, 5.0f), Seq(3.0f, 7.0f, 1.0f))
      .map(Tuple1(_)).toDF("embedding")
    val (mu, sd) = Spectral.dimStats(vecs, "embedding")
    assert(mu == Seq(2.0, 7.0, 3.0), s"mu $mu")
    assert(sd(0) == 1.0 && sd(2) == 2.0, s"sd $sd") // pop-std of {1,3}/{5,1}
    assert(sd(1) == 1.0, "a constant dimension must guard to sd 1")
  }

  test("centroidDrift: identical halves cos 1, mirrored halves cos −1, zero slice guards to 0") {
    import spark.implicits._
    val a = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 0.0f)).map(Tuple1(_)).toDF("embedding")
    val same = Spectral.centroidDrift(a, a, "embedding").head()
    assert(same.getLong(0) == 2L && same.getLong(1) == 2L)
    assert(same.getDouble(2) == 1.0)
    val neg = Seq(Seq(-1.0f, -2.0f), Seq(-3.0f, 0.0f)).map(Tuple1(_)).toDF("embedding")
    assert(Spectral.centroidDrift(a, neg, "embedding").head().getDouble(2) == -1.0)
    val zero = Seq(Seq(0.0f, 0.0f)).map(Tuple1(_)).toDF("embedding")
    assert(Spectral.centroidDrift(a, zero, "embedding").head().getDouble(2) == 0.0,
      "a zero-norm centroid must yield 0, not a division artifact")
  }

  test("effectiveDim: 1 when one coordinate varies, d when all vary equally") {
    import spark.implicits._
    // variance only in dim 0
    val one = Seq(Seq(1.0f, 5.0f, 5.0f), Seq(3.0f, 5.0f, 5.0f),
      Seq(9.0f, 5.0f, 5.0f)).map(Tuple1(_)).toDF("embedding")
    val r1 = Spectral.effectiveDim(one, "embedding").head()
    assert(r1.getLong(0) == 3L && r1.getDouble(1) == 1.0, r1.toString)
    assert(r1.getLong(2) == 0L && r1.getDouble(3) == 1.0)
    // equal variance in every coordinate → PR = d exactly
    val eq = Seq(Seq(0.0f, 0.0f, 0.0f), Seq(2.0f, 2.0f, 2.0f))
      .map(Tuple1(_)).toDF("embedding")
    val r2 = Spectral.effectiveDim(eq, "embedding").head()
    assert(r2.getDouble(1) == 3.0, r2.toString)
  }
}
