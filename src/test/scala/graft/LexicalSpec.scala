package graft

import org.apache.spark.sql.functions._

import graft.analysis.Contamination
import graft.search.Lexical
import graft.text.TextAnalysis

/** Lexical retrieval (BM25), hybrid fusion (RRF), PII redaction and
  * benchmark-contamination — key properties on crafted fixtures; the
  * DuckDB oracle covers the full corpus paths. */
class LexicalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: matching docs only, multi-term match outranks one repeated term") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "spark spark spark noise"),
      (3L, "spark join"),
      (4L, "plain filler words here")
    ).toDF("doc_id", "text")
    val out = Lexical.bm25TopK(docs, "text", "doc_id", Seq("spark", "join"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(!out.map(_._1).contains(1L) && !out.map(_._1).contains(4L))
    // two distinct terms beat one term saturated by k1 (tf=3 < 2 fresh terms)
    assert(out.head._1 == 3L, out.mkString(","))
    val scores = out.map(_._2)
    assert(scores.sameElements(scores.sorted.reverse))
    // deterministic across runs
    val again = Lexical.bm25TopK(docs, "text", "doc_id", Seq("spark", "join"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.sameElements(again))
  }

  test("rrf: agreement across both rankings beats a single first place") {
    val a = Seq((10L, 0.9), (20L, 0.8), (30L, 0.7)).toDF("id", "sa")
    val b = Seq((10L, 0.95), (40L, 0.85)).toDF("id", "sb")
    val out = Lexical.rrfFuse(a, b, "id", "sa", "sb", 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // 10: 1/61+1/61; 20 and 40: 1/62 each (tie → id asc); 30: 1/63
    assert(out.map(_._1).toSeq == Seq(10L, 20L, 40L, 30L))
    assert(out.head._2 > out(1)._2)
    assert(out(1)._2 == out(2)._2)
  }

  test("pii redaction replaces emails and phones, leaves clean text alone") {
    val out = Seq(
      (0L, "mail a.b+c@ex-ample.co.uk now or call +1-555-123-4567 ok"),
      (1L, "no pii here @ not-an-email +1-55-1"))
      .toDF("id", "t")
      .select(col("id"), TextAnalysis.redactPii(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "mail [EMAIL] now or call [PHONE] ok")
    assert(out(1L) == "no pii here @ not-an-email +1-55-1")
  }

  test("fused token_shingle_hashes matches the composed HOF spec, incl. edges") {
    val real = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val edges = Seq((9001L, ""), (9002L, "   "), (9003L, "one"),
      (9004L, "a  b c"), (9005L, "MiXeD Case tokens"))
      .toDF("doc_id", "text")
    for (df <- Seq(real, edges)) {
      val composed = Contamination.gramRowsComposed(df, "text", Seq(col("doc_id")), 3)
      val native = df.select(col("doc_id"),
        explode(graft.functions.TokenShingleHashes(col("text"), 3)).as("gram"))
      val diff = native.exceptAll(composed).count() + composed.exceptAll(native).count()
      assert(diff == 0, s"fused vs composed gram mismatch: $diff rows")
    }
  }

  test("contamination flags exactly the docs sharing an n-token shingle") {
    val train = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "zeta eta theta"),
      (3L, "x y alpha beta gamma")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = Contamination.contaminated(train, bench, "text", "doc_id", 3)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L))
  }
}
