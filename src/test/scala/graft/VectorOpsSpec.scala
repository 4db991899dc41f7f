package graft

import org.apache.spark.sql.functions._

import graft.vector.VectorOps

/** Cosine kernel edge cases replicated from the reference
  * (`/root/reference/services/vectorDb.ts:26-52`, FIXTURES.md §B). */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    Seq((a.map(_.toFloat), b.map(_.toFloat))).toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b")).as("c"))
      .head().getDouble(0)

  test("cosineBasic: identical → 1, orthogonal → 0, opposite → -1, 3-4-5") {
    assert(cos(Seq(1, 0), Seq(1, 0)) === 1.0)
    assert(cos(Seq(1, 0), Seq(0, 1)) === 0.0)
    assert(cos(Seq(1, 0), Seq(-1, 0)) === -1.0)
    assert(math.abs(cos(Seq(3, 4), Seq(4, 3)) - 24.0 / 25.0) < 1e-12)
  }

  test("cosineZeroVec: zero magnitude → 0 (vectorDb.ts:47-49)") {
    assert(cos(Seq(0, 0), Seq(1, 2)) === 0.0)
    assert(cos(Seq(1, 2), Seq(0, 0)) === 0.0)
    assert(cos(Seq(0, 0), Seq(0, 0)) === 0.0)
  }

  test("cosineDimMismatch: dim 2 vs dim 3 → -1, no throw (vectorDb.ts:27-32)") {
    assert(cos(Seq(1, 0), Seq(1, 0, 0)) === -1.0)
  }

  test("property: symmetry, range [-1,1], positive-scale invariance (seeded)") {
    val rnd = new scala.util.Random(42)
    // batch all cases into one DataFrame pass (one Spark job, not 60)
    val cases = (1 to 20).map { _ =>
      val n = 1 + rnd.nextInt(16)
      (Seq.fill(n)((rnd.nextDouble() * 20 - 10).toFloat),
        Seq.fill(n)((rnd.nextDouble() * 20 - 10).toFloat))
    }
    import spark.implicits._
    val rows = cases.toDF("a", "b").select(
      VectorOps.cosine(col("a"), col("b")).as("ab"),
      VectorOps.cosine(col("b"), col("a")).as("ba"),
      VectorOps.cosine(col("a"), transform(col("b"), x => x * 3.0f)).as("scaled"))
      .collect()
    rows.foreach { r =>
      val (ab, ba, sc) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
      assert(math.abs(ab - sc) < 1e-6)
    }
  }

  test("l2Normalize: unit norm for nonzero, identity for zero") {
    val df = Seq(Seq(3f, 4f), Seq(0f, 0f)).toDF("v")
      .select(VectorOps.l2Norm(VectorOps.l2Normalize(col("v"))).as("n"))
    val ns = df.collect().map(_.getDouble(0))
    assert(math.abs(ns(0) - 1.0) < 1e-12)
    assert(ns(1) === 0.0)
  }

  test("l2Normalize fused kernel ≡ HOF spec (seeded, incl. zero vector)") {
    val rnd = new scala.util.Random(7)
    val cases = Seq(Seq(0f, 0f, 0f)) ++ (1 to 20).map { _ =>
      Seq.fill(1 + rnd.nextInt(16))((rnd.nextDouble() * 20 - 10).toFloat)
    }
    val rows = cases.toDF("v").select(
      VectorOps.l2Normalize(col("v")).as("fused"),
      VectorOps.l2NormalizeHof(col("v")).as("spec"))
      .collect()
    rows.foreach { r =>
      val (f, s) = (r.getSeq[Double](0), r.getSeq[Double](1))
      assert(f.size === s.size)
      f.zip(s).foreach { case (x, y) => assert(x === y) } // bit-identical
    }
  }

  test("l2Normalize: null element → null result") {
    val df = spark.sql("SELECT array(1.0D, CAST(NULL AS DOUBLE), 3.0D) AS v")
      .select(VectorOps.l2Normalize(col("v")).as("n"))
    assert(df.head().isNullAt(0))
  }

  test("normalized dot ≡ cosine on raw vectors (the ingest-once identity)") {
    val rnd = new scala.util.Random(11)
    val cases = (1 to 20).map { _ =>
      val n = 1 + rnd.nextInt(16)
      (Seq.fill(n)((rnd.nextDouble() * 20 - 10).toFloat),
        Seq.fill(n)((rnd.nextDouble() * 20 - 10).toFloat))
    } :+ ((Seq(0f, 0f), Seq(1f, 2f))) // zero-vector edge: dot of self-normalized zero = 0 = cosine
    val rows = cases.toDF("a", "b").select(
      round(graft.functions.DotProduct(
        VectorOps.l2Normalize(col("a")), VectorOps.l2Normalize(col("b"))), 6).as("nd"),
      round(VectorOps.cosine(col("a"), col("b")), 6).as("c"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }
}
