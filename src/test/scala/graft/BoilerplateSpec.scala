package graft

import org.apache.spark.sql.functions._

import graft.analysis.Boilerplate

/** Cross-corpus boilerplate removal: planted shared segments vanish
  * from every document, unique content survives in order, and the
  * segmentation handles tails and degenerate docs. */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  test("planted boilerplate header is dropped everywhere; unique content survives in order") {
    val header = "all rights reserved by example"  // 5 tokens = 1 segment + tail? use segTokens=5
    val docs = Seq(
      (1L, s"$header alpha beta gamma delta epsilon"),
      (2L, s"$header one two three four five"),
      (3L, "totally unique content here nothing shared with others at all"))
      .toDF("doc_id", "text")
    val out = Boilerplate.dropCommonSegments(docs, "doc_id", "text", 5, 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("alpha beta gamma delta epsilon", 1L))
    assert(out(2L) == ("one two three four five", 1L))
    assert(out(3L)._2 == 0L)
    assert(out(3L)._1 == "totally unique content here nothing shared with others at all")
  }

  test("tail segments shorter than segTokens round-trip; all-boilerplate doc empties") {
    val docs = Seq(
      (1L, "shared shared shared shared tailtok"),   // seg0 shared, seg1 = 1-token tail
      (2L, "shared shared shared shared other tail words"),
      (3L, "shared shared shared shared"))            // ONLY the shared segment
      .toDF("doc_id", "text")
    val out = Boilerplate.dropCommonSegments(docs, "doc_id", "text", 4, 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("tailtok", 1L))
    assert(out(2L) == ("other tail words", 1L))
    assert(out(3L) == ("", 1L))
  }

  test("no boilerplate ⇒ clean stream equals the normalized token stream") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(20)
    // minDocFreq above any real df in 20 docs ⇒ nothing dropped
    val out = Boilerplate.dropCommonSegments(docs, "doc_id", "text", 4, 100)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val toks = docs.select(col("doc_id"),
        array_join(graft.text.TextAnalysis.tokens(col("text")), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, (clean, dropped)) <- out) {
      assert(dropped == 0L, s"doc $id dropped $dropped")
      assert(clean == toks(id), s"doc $id reassembly differs")
    }
  }

  test("fixture has real cross-doc segments: the corpus query is a non-trivial gate") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = Boilerplate.dropCommonSegments(docs, "doc_id", "text", 4, 2)
    assert(out.filter(col("n_dropped") > 0).count() > 0,
      "no doc lost a segment — the boilerplate_removed oracle is vacuous")
  }
}
