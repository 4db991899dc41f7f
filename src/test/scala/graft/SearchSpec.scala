package graft

import org.apache.spark.sql.functions._

import graft.search.Search

/** kNN semantics from `/root/reference/services/vectorDb.ts:11-24` +
  * context aggregation from `App.tsx:192` (FIXTURES.md §B). */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val q = Seq(Tuple1(Seq(1f, 0f))).toDF("qvec")

  test("emptyCorpus: 0-row corpus → 0 rows (vectorDb.ts:12-14)") {
    val corpus = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Search.knn(corpus, q, 5).count() == 0)
  }

  test("topKTies: identical similarities break by id asc") {
    val corpus = Seq(
      (3L, Seq(2f, 0f)), (1L, Seq(5f, 0f)), (2L, Seq(1f, 0f)), (4L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val ids = Search.knn(corpus, q, 3).select("vec_id").collect().map(_.getLong(0))
    assert(ids.toSeq == Seq(1L, 2L, 3L)) // all sim=1.0 ties → id asc
  }

  test("knn returns k most similar with sim column rounded") {
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(1f, 1f)), (3L, Seq(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val rows = Search.knn(corpus, q, 2).select("vec_id", "sim").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows(0).getDouble(1) == 1.0)
    assert(math.abs(rows(1).getDouble(1) - 0.707107) < 1e-9)
  }

  test("contextOrder: texts joined with \\n---\\n in rank order (App.tsx:192)") {
    val top = Seq((1L, "first", 0.9), (2L, "second", 0.8), (3L, "third", 0.7))
      .toDF("id", "text", "sim")
    val ctx = Search.contextAgg(top, col("id"), col("text"), col("sim"))
      .head().getString(0)
    assert(ctx == "first\n---\nsecond\n---\nthird")
  }

  test("similarityJoin: per-query top-k with rank") {
    val corpus = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, Seq(1f, 0f)), (20L, Seq(0f, 1f)))
      .toDF("qid", "qvec")
    val out = Search.similarityJoin(corpus, queries, 2)
      .select("qid", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((10L, 1L, 1), (10L, 3L, 2), (20L, 2L, 1), (20L, 3L, 2)))
  }

  test("blocked similarity join == broadcast similarity join on real data") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id", "sim", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val broadcastForm = norm(Search.similarityJoin(emb, qs, 3))
    val blockedForm = norm(Search.similarityJoinBlocked(emb, qs, 3, blocks = 7))
    assert(broadcastForm == blockedForm)
  }

  test("knnDot over a normalized corpus returns the same top-k ids as knn on raw vectors") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 3).select(col("embedding").as("qvec"))
    val raw = Search.knn(emb, q, 10).select("vec_id").collect().map(_.getLong(0)).toSeq
    val nc = emb.select(col("vec_id"),
      graft.vector.VectorOps.l2Normalize(col("embedding")).as("nvec"))
    val nq = q.select(graft.vector.VectorOps.l2Normalize(col("qvec")).as("qvec"))
    val viaDot = Search.knnDot(nc, nq, 10, vecCol = "nvec")
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(viaDot == raw)
  }

  test("prompt template interpolates context and question") {
    val out = Seq(Tuple1("CTX")).toDF("context")
      .select(Search.prompt(col("context"), lit("Q?")).as("p"))
      .head().getString(0)
    // verbatim reference template (geminiService.ts:80-88): --- fences
    // around the context, inline "Question: ", trailing newline
    assert(out.contains("Context:\n---\nCTX\n---\n") && out.contains("Question: Q?\n"))
    assert(out.startsWith("Based on the following context, please provide a comprehensive answer"))
    assert(out.endsWith("\n"))
  }
}
