package graft

import org.apache.spark.sql.functions._
import graft.plans.NormalizedCosineRewrite
import graft.vector.VectorOps

/** The normalized-cosine → dot-product optimizer rule: fires on the
  * composed shape, preserves results, leaves raw cosine alone. */
class RewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ NormalizedCosineRewrite
    try body finally spark.experimental.extraOptimizations = prev
  }

  private val df = Seq(
    (1L, Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f)),
    (2L, Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f)),   // zero vector
    (3L, Seq(1.0f, -1.0f, 2.0f), Seq(1.0f, -1.0f, 2.0f))) // identical
    .toDF("id", "a", "b")

  // repartition blocks ConvertToLocalRelation from constant-folding the
  // literal input, so the optimized plan keeps the expression visible
  private def composed = df.repartition(2).select(col("id"),
    round(VectorOps.cosine(
      VectorOps.l2Normalize(col("a")), VectorOps.l2Normalize(col("b"))), 6).as("sim"))

  test("rule rewrites cos_sim(l2_normalize, l2_normalize) to dot_product") {
    withRule {
      val plan = composed.queryExecution.optimizedPlan.toString
      assert(plan.contains("dot_product"), plan)
      assert(!plan.contains("cos_sim"), plan)
    }
  }

  test("rewritten results equal the unrewritten ones at round-6") {
    val before = composed.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val after = withRule {
      composed.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(before == after)
    assert(after(2L) == 0.0, "zero-vector edge must stay 0.0")
    assert(after(3L) == 1.0, "self-similarity must stay 1.0")
  }

  test("raw cosine (non-normalized inputs) is left alone") {
    withRule {
      val plan = df.repartition(2).select(VectorOps.cosine(col("a"), col("b")))
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("cos_sim"), plan)
    }
  }
}
