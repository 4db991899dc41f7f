package graft

import org.apache.spark.sql.functions._

import graft.vector.VectorOps

/** Rademacher random projection: matrix determinism (pure function of
  * the two dims), the Johnson–Lindenstrauss claim actually holding on
  * real embeddings (projected dot products correlate with exact ones),
  * and the map-only plan shape (no shuffle introduced). */
class RandomProjectionSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("sign matrix is deterministic, ±1, and balanced-ish") {
    val a = VectorOps.rpSigns(64, 16)
    val b = VectorOps.rpSigns(64, 16)
    assert(a == b)
    assert(a.length == 16 && a.forall(_.length == 64))
    assert(a.flatten.forall(s => s == 1.0 || s == -1.0))
    val pos = a.flatten.count(_ == 1.0)
    // 1024 fair-ish coin flips: expect ~512, allow a wide band
    assert(pos > 400 && pos < 624, s"suspiciously unbalanced: $pos/1024")
  }

  test("Spark projection equals a hand-rolled JVM computation exactly") {
    val signs = VectorOps.rpSigns(64, 16)
    val rows = emb.limit(5)
      .select(col("embedding"),
        VectorOps.randomProject(col("embedding"), signs).as("p"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val got = r.getSeq[Double](1)
      val want = signs.map(row =>
        // same left-fold order and double promotion as VectorOps.dot
        v.zip(row).foldLeft(0.0) { case (acc, (x, s)) => acc + x.toDouble * s })
      assert(got == want, s"mismatch: $got vs $want")
    }
  }

  test("JL noise shrinks with output dim: cosine fidelity improves 8 -> 48") {
    // Pearson correlation between exact 64-dim cosine and projected
    // cosine, per output dim. These embeddings are near-uniform (exact
    // cosines have tiny spread), so absolute correlation is modest —
    // the pinned claim is the deterministic ordering: more projected
    // dims => strictly better fidelity (a transposed/misindexed matrix
    // breaks this monotonicity as surely as it breaks any threshold).
    def corrAt(outDim: Int): Double = {
      val signs = VectorOps.rpSigns(64, outDim)
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"),
          VectorOps.randomProject(col("embedding"), signs).as("qp"))
      val scored = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(
          VectorOps.cosine(col("embedding"), col("qv")).as("exact"),
          VectorOps.cosine(VectorOps.randomProject(col("embedding"), signs),
            col("qp")).as("approx"))
        .collect()
      val n = scored.length.toDouble
      val (xs, ys) = (scored.map(_.getDouble(0)), scored.map(_.getDouble(1)))
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      cov / math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
    }
    val (c8, c48) = (corrAt(8), corrAt(48))
    assert(c48 > c8, s"fidelity did not improve with dims: c8=$c8 c48=$c48")
    // absolute bar is low by design: these uniform-positive embeddings
    // share a large mean component, so exact cosines cluster in a
    // ~0.05-wide band while JL noise at k=48 has std ~1/sqrt(48)=0.14 —
    // correlation ~0.16 is the DATA's ceiling, not the operator's
    // (the hand-rolled-equality test above pins the arithmetic).
    assert(c48 > 0.1, s"48-dim projection should track exact cosine: $c48")
  }

  test("fused kernel ≡ HOF reference bit-for-bit; null/shape edges") {
    val signs = VectorOps.rpSigns(64, 16)
    val both = emb.select(
      VectorOps.randomProject(col("embedding"), signs).as("k"),
      VectorOps.randomProjectHof(col("embedding"), signs).as("h"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1), "kernel != HOF")
    }
    // dimension mismatch and null input -> NULL (never a truncated
    // projection, which would silently mis-rank)
    import spark.implicits._
    val bad = Seq(Seq(1.0, 2.0), null).toDF("v")
      .select(VectorOps.randomProject(col("v"), signs).as("p"))
      .collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("projection is map-only: plan has no exchange below the project") {
    val signs = VectorOps.rpSigns(64, 16)
    val plan = emb.select(VectorOps.randomProject(col("embedding"), signs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
