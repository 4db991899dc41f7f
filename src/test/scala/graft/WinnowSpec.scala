package graft

import org.apache.spark.sql.functions._

import graft.text.Winnow

/** Winnowing fingerprints: closed-form selection, the paper's local
  * detection guarantee, short-input degeneration, and the overlap
  * report's df-filter. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1000000007L

  /** Reference model of the whole chain, independent of the Spark
    * expression: token poly hashes → k-shingle folds → window-w minima
    * → distinct set. */
  private def expected(text: String, k: Int, w: Int): Set[Long] = {
    val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
    val th = toks.map(t => t.codePoints().toArray
      .foldLeft(7L)((h, c) => (h * 31 + c) % M))
    val t = th.length
    val grams = (0 until math.max(t - k, 0) + 1).map { g =>
      th.slice(g, math.min(g + k, t)).foldLeft(7L)((h, x) => (h * 31 + x) % M)
    }
    (0 until math.max(grams.length - w, 0) + 1)
      .map(i => grams.slice(i, i + w).min).toSet
  }

  private def run(text: String, k: Int = 3, w: Int = 4): Set[Long] =
    Seq(text).toDF("text")
      .select(Winnow.fingerprints(col("text"), k, w).as("fps"))
      .head().getSeq[Long](0).toSet

  test("selection matches the closed-form model") {
    val doc = "the quick brown fox jumps over the lazy dog again and again"
    assert(run(doc) == expected(doc, 3, 4))
    val doc2 = "alpha beta gamma delta epsilon zeta eta theta"
    assert(run(doc2) == expected(doc2, 3, 4))
  }

  test("guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    // k=3, w=4 → any shared 6-token run must yield a common fingerprint
    val shared = "one two three four five six"
    val a = s"prefixa m1 m2 $shared suffixa q1"
    val b = s"zz yy xx ww $shared vv uu tt"
    assert(run(a).intersect(run(b)).nonEmpty,
      "the 6-token shared run must surface in both fingerprint sets")
  }

  test("short inputs degenerate to one fingerprint, empty to the seed fold") {
    assert(run("only two").size == 1, "fewer shingles than w → global min")
    // empty token list: shingle stream = [seed-fold of zero tokens] = [7]
    assert(run("   ") == Set(7L))
  }

  test("containmentPairs: an excerpt inside a long doc scores ~1 where overlap dilutes") {
    val excerpt = "e1 e2 e3 e4 e5 e6 e7 e8"
    val filler = (1 to 60).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, excerpt),                  // the short source
      (2L, s"$filler $excerpt"),      // pasted into a long doc
      (3L, "z1 z2 z3 z4 z5 z6 z7")
    ).toDF("doc_id", "text")
    val out = Winnow.containmentPairs(docs, "doc_id", "text",
        k = 3, w = 4, maxDf = 10, minContain = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.length == 1 && out.head._1 == 1L && out.head._2 == 2L,
      s"got ${out.toSeq}")
    assert(out.head._3 >= 0.5,
      "every fingerprint of the excerpt must reappear in its host")
    // the symmetric overlap report would need a LOW threshold to see
    // this pair at all relative to doc 2's size — containment is the
    // right lens; sanity: the shared count is bounded by the excerpt
    val shared = Winnow.overlapPairs(docs, "doc_id", "text", 3, 4, 10, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(shared.toSeq == out.map(x => (x._1, x._2, shared.head._3)).toSeq)
  }

  test("overlapPairs finds planted overlap and df-filters boilerplate") {
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8" // 8 tokens ≥ w+k-1
    val docs = Seq(
      (1L, s"a1 a2 a3 $passage a4 a5"),
      (2L, s"b1 b2 $passage b3 b4 b5"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9")
    ).toDF("doc_id", "text")
    val pairs = Winnow.overlapPairs(docs, "doc_id", "text",
      k = 3, w = 4, maxDf = 10, minShared = 1).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    // with maxDf = 1 every shared fingerprint (df = 2) is boilerplate → no pairs
    val filtered = Winnow.overlapPairs(docs, "doc_id", "text",
      k = 3, w = 4, maxDf = 1, minShared = 1).count()
    assert(filtered == 0, "df-filter must drop fingerprints above maxDf")
  }
}
