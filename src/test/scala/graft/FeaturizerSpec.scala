package graft

import org.apache.spark.sql.functions._

import graft.embed.Featurizer

/** Featurizer determinism — the zero-egress substitution contract for
  * `/root/reference/services/geminiService.ts:27-77` (FIXTURES.md §B). */
class FeaturizerSpec extends SparkSpec {
  import spark.implicits._

  test("featurizerDeterminism: same text → identical vector") {
    val a = Featurizer.featurizeText("spark scan shuffle join")
    val b = Featurizer.featurizeText("spark scan shuffle join")
    assert(a.toSeq == b.toSeq)
  }

  test("unit L2 norm for non-empty text; zero vector for empty") {
    val v = Featurizer.featurizeText("hash join agg")
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-12)
    assert(Featurizer.featurizeText("").forall(_ == 0.0))
    assert(Featurizer.featurizeText("   ").forall(_ == 0.0))
  }

  test("dimension is configurable (constants.ts:6 analogue)") {
    assert(Featurizer.featurizeText("x", 768).length == 768)
    assert(Featurizer.featurizeText("x", 64).length == 64)
  }

  test("column form matches driver-side form row by row") {
    val df = Seq("alpha beta", "gamma", "").toDF("text")
    val got = df.select(col("text"), Featurizer.featurize(16)(col("text")).as("v"))
      .collect().map(r => (r.getString(0), r.getSeq[Double](1)))
    got.foreach { case (t, v) =>
      assert(v == Featurizer.featurizeText(t, 16).toSeq)
    }
  }

  test("case-insensitive tokenization") {
    assert(Featurizer.featurizeText("Spark JOIN").toSeq ==
      Featurizer.featurizeText("spark join").toSeq)
  }

  test("native expression matches the JVM kernel (counts + normalized, incl. non-BMP)") {
    val texts = Seq("alpha beta beta", "", "   ", "emoji 😀🦄 token",
      "a  b   c", "Spark JOIN agg", "ümlaut ÉTÉ")
    val df = texts.toDF("text")
    val got = df.select(col("text"),
        Featurizer.featurizeCounts(16)(col("text")).as("c"),
        Featurizer.featurize(16)(col("text")).as("n"))
      .collect()
    got.foreach { r =>
      val t = r.getString(0)
      assert(r.getSeq[Double](1) == Featurizer.featurizeCountsText(t, 16).toSeq, s"counts for '$t'")
      assert(r.getSeq[Double](2) == Featurizer.featurizeText(t, 16).toSeq, s"normalized for '$t'")
    }
  }

  test("featurize stays native: no ScalaUDF node in the plan") {
    val df = Seq("x y z").toDF("text")
      .select(Featurizer.featurize(8)(col("text")).as("v"))
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
  }
}
