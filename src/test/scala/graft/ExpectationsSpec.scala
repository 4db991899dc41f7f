package graft

import org.apache.spark.sql.functions._

import graft.analysis.Expectations._

/** Expectation-gate semantics: band verdicts on the rounded observed
  * value, null observations fail bounded checks, declared order kept,
  * and the one-scan plan contract. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("verdicts: pass, fail, and null-observed-fails") {
    val df = Seq((1L, "a", 5.0), (2L, "b", -1.0), (2L, "a", 3.0))
      .toDF("id", "k", "v")
    val got = evaluate(df, Seq(
      Expectation("id_unique", uniqueRate(col("id")),
        lo = Some(1.0), hi = Some(1.0)),            // 2/3 -> fail
      Expectation("v_min", min(col("v")), lo = Some(0.0)), // -1 -> fail
      Expectation("v_max", max(col("v")), hi = Some(5.0)), // 5 -> pass
      Expectation("k_domain", satisfiedRate(col("k").isin("a", "b")),
        lo = Some(1.0)),                            // pass
      Expectation("null_min", min(when(col("v") > 99, col("v"))),
        lo = Some(0.0))))                           // null observed -> fail
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(if (r.isNullAt(2)) null else r.getDouble(2)), r.getBoolean(3)))
      .toSeq
    assert(got.map(_._2) == Seq("id_unique", "v_min", "v_max",
      "k_domain", "null_min"), s"order $got")
    assert(got.map(_._4) == Seq(false, false, true, true, false), s"got $got")
    assert(got(0)._3.contains(0.666667), s"got ${got(0)}")
    assert(got(4)._3.isEmpty, "null observation must surface as null")
  }

  test("all checks ride one scan of the input") {
    val df = Seq((1L, 2.0)).toDF("id", "v")
    val plan = evaluate(df, Seq(
      Expectation("a", nullRate(col("v")), hi = Some(0.0)),
      Expectation("b", uniqueRate(col("id")), lo = Some(1.0)),
      Expectation("c", min(col("v")), lo = Some(0.0))))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size == 1, s"expected one scan:\n$plan")
  }
}
