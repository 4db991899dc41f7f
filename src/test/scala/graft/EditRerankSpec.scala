package graft

import org.apache.spark.sql.Row
import graft.analysis.Dedup

/** Pins for the fuzzy-dedup rerank: thresholded Levenshtein semantics
  * in isolation, and the composed LSH-block → edit-verify path. */
class EditRerankSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and keeps running far"

  test("editRerank keeps pairs within maxDist, drops the rest") {
    val docs = Seq(
      (1L, base),
      (2L, base.replace("jumps", "leaps")), // 3 substitutions
      (3L, "completely different text with nothing shared at all here"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.editRerank(pairs, docs, "doc_id", "text",
      prefixLen = 200, maxDist = 10).collect()
    // (1,3) is far beyond 10 → thresholded levenshtein returns -1 → dropped
    assert(out.toSeq == Seq(Row(1L, 2L, 3L)))
  }

  test("prefixLen bounds the comparison window") {
    // distance 0 on the first 10 chars even though the tails differ
    val docs = Seq((1L, "same start AAAA"), (2L, "same start BBBB"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.editRerank(pairs, docs, "doc_id", "text",
      prefixLen = 10, maxDist = 5).collect()
    assert(out.toSeq == Seq(Row(1L, 2L, 0L)))
  }

  test("composed path: LSH candidates feed the edit verify") {
    val docs = Seq(
      (1L, base), (2L, base.replace("jumps", "leaps")),
      (3L, "unrelated corpus row that shares no shingles with the pair"))
      .toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text", 5, 32, 8)
    val out = Dedup.editRerank(cands, docs, "doc_id", "text", 200, 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 3L)))
  }
}
