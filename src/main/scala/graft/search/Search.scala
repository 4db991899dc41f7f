package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.vector.VectorOps

/** Retrieval operators: brute-force kNN top-k, batch similarity join,
  * rank-ordered context aggregation.
  *
  * Reference semantics: `InMemoryVectorDB.search`
  * (`/root/reference/services/vectorDb.ts:11-24`) scores every chunk,
  * full-sorts desc, slices top-K. JS `Array.sort` leaves ties
  * unspecified; we define the total order `sim DESC, id ASC` (SURVEY §5).
  *
  * Scale notes:
  *  - `knn` plans as broadcast(1-row query) + scan + TakeOrderedAndProject:
  *    per-partition bounded heap, driver merges k rows — strictly better
  *    than the reference's O(N log N) full sort, and embarrassingly
  *    parallel over corpus partitions.
  *  - `similarityJoin` broadcasts the (small) query side across corpus
  *    partitions; per-query top-k via a window on qid. For huge query
  *    sides you'd flip to block-partitioned crossJoin; the query side in
  *    all driver workloads is small, so broadcast is the right plan.
  */
object Search {

  /** Top-k most similar corpus rows to a single query vector.
    * `query` must be a 1-row DataFrame with a vector column `qvec`.
    * Returns the corpus row plus `sim` (rounded to 6).
    * Empty corpus → 0 rows (early return in `vectorDb.ts:12-14` — free
    * with Spark: empty scan yields empty result). */
  def knn(corpus: DataFrame, query: DataFrame, k: Int,
          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus
      .crossJoin(broadcast(query))
      .withColumn("sim", VectorOps.cosine6(col(vecCol), col("qvec")))
      .drop("qvec")
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)

  /** Top-k over a PRE-NORMALIZED corpus: scores with the fused plain
    * dot product ([[graft.functions.DotProduct]]) — a third of the
    * multiply-adds and no per-row sqrt versus the cosine kernel, the
    * right trade at ingest-once/query-many scale. `query`'s `qvec` must
    * be normalized too ([[VectorOps.l2Normalize]]); then results equal
    * [[knn]] on the raw vectors, including the zero-vector (0.0) and
    * dim-mismatch (-1.0) edges. */
  def knnDot(corpus: DataFrame, query: DataFrame, k: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus
      .crossJoin(broadcast(query))
      .withColumn("sim", round(graft.functions.DotProduct(col(vecCol), col("qvec")), 6))
      .drop("qvec")
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)

  /** Maximal Marginal Relevance (Carbonell-Goldstein 1998) re-ranking:
    * top-k diversified results from a relevance `shortlist`. Pure
    * relevance ranking returns near-duplicates back to back; MMR picks
    * greedily by `lambda·rel − (1−lambda)·max-sim-to-already-picked`,
    * trading relevance against redundancy.
    *
    * The selection is inherently sequential in k, so it runs on the
    * DRIVER over the collected shortlist — bounded model state
    * (`shortlist` rows of one vector each, like Lloyd centroids), never
    * the corpus: the distributed work is exactly the [[knn]] shortlist
    * scan (TakeOrderedAndProject), and everything after is O(shortlist²)
    * on kilobytes. Arithmetic is the project float contract: relevance
    * and pairwise cosines round-6 (HALF_UP, the [[Ann.probeIds]]
    * precedent), scores `r6(lambda·rel − (1−lambda)·maxSim)`, ties to
    * the lower id — so a SQL engine replays the greedy fold exactly.
    * Prefer a dyadic `lambda` (0.75, 0.5) so `1 − lambda` is exact and
    * the replay can inline both factors bit-identically. */
  def mmrTopK(corpus: DataFrame, query: DataFrame, k: Int, shortlist: Int,
              lambda: Double,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && shortlist >= k, "need shortlist >= k >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    // knn's total order (sim DESC, id ASC) survives the collect
    val sl = knn(corpus, query, shortlist, idCol, vecCol)
      .select(col(idCol).cast("long"), col("sim"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Number](2).map(_.doubleValue()).toSeq))
      .toSeq
    mmrGreedy(sl, k, lambda).toDF(idCol, "mmr_rank", "relevance", "mmr_score")
      .select(col(idCol), col("mmr_rank").cast("long"),
        col("relevance"), col("mmr_score"))
  }

  /** The sequential MMR greedy over ONE collected shortlist — shared
    * by the single-query and batch forms. Uses the shared driver-side
    * kernel pair (VectorOps): same accumulation order and HALF_UP
    * rounding as every other scorer. Returns
    * `(id, rank, relevance, score)` rows in pick order. */
  private def mmrGreedy(sl: Seq[(Long, Double, Seq[Double])], k: Int,
                        lambda: Double): Seq[(Long, Int, Double, Double)] = {
    def r6(x: Double): Double = VectorOps.round6(x)
    def cos(a: Seq[Double], b: Seq[Double]): Double = VectorOps.cosineLocal(a, b)
    val mu = 1.0 - lambda
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double, Double)]
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    val remaining = scala.collection.mutable.LinkedHashMap(
      sl.map { case (id, rel, v) => id -> ((rel, v)) }: _*)
    while (picked.size < math.min(k, sl.length)) {
      val scored = remaining.map { case (id, (rel, v)) =>
        val maxSim =
          if (pickedVecs.isEmpty) 0.0
          else pickedVecs.map(p => r6(cos(v, p))).max
        val score =
          if (pickedVecs.isEmpty) r6(lambda * rel)
          else r6(lambda * rel - mu * maxSim)
        (id, rel, score)
      }
      // rank 1 selects on the UNSCALED relevance (the oracle's pick1
      // orders by sim DESC, id ASC): round6(lambda·rel) can collapse
      // two distinct round-6 sims onto one score, and a rank-1 tie
      // broken differently would diverge the whole greedy sequence
      val (id, rel, score) =
        if (pickedVecs.isEmpty) scored.maxBy { case (i, r, _) => (r, -i) }
        else scored.maxBy { case (i, _, s) => (s, -i) }
      picked += ((id, picked.size + 1, rel, score))
      pickedVecs += remaining(id)._2
      remaining.remove(id)
    }
    picked.toSeq
  }

  /** BATCH MMR — [[mmrTopK]] over a query TABLE, fully DISTRIBUTED:
    * ONE distributed batch shortlist ([[similarityJoin]] — per-qid
    * windows, no per-query Spark job), then the inherently-sequential
    * greedy runs EXECUTOR-SIDE per qid (`groupByKey(qid).flatMapGroups`
    * over the same pure [[mmrGreedy]] kernel the single-query form
    * uses) — the driver never sees a shortlist row or a vector.
    * Per-group state is one shortlist (the single-query contract);
    * across a 100 k-query batch the greedies parallelize over
    * executors instead of serializing through one driver thread.
    * Batch restricted to one query ≡ [[mmrTopK]] (spec-pinned, both
    * against the driver-fold). Returns
    * `(qid, id, mmr_rank, relevance, mmr_score)`, k rows per qid. */
  def mmrTopKBatch(corpus: DataFrame, queries: DataFrame, k: Int, shortlist: Int,
                   lambda: Double,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && shortlist >= k, "need shortlist >= k >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    similarityJoin(corpus, queries, shortlist, idCol, vecCol)
      .select(col("qid").cast("long"), col(idCol).cast("long"), col("sim"),
        col(vecCol).cast("array<double>"))
      .as[(Long, Long, Double, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // restore the per-qid knn total order after the group shuffle
        val ordered = it.toSeq.sortBy(t => (-t._3, t._2))
          .map(t => (t._2, t._3, t._4))
        mmrGreedy(ordered, k, lambda).map { case (id, rank, rel, score) =>
          (qid, id, rank.toLong, rel, score)
        }
      }
      .toDF("qid", idCol, "mmr_rank", "relevance", "mmr_score")
  }

  /** Batch similarity join: for every row of `queries` (id `qid`, vector
    * `qvec`), the top-k most similar corpus rows. Broadcast nested-loop
    * join + per-qid window top-k (`row_number <= k`, total order
    * `sim DESC, id ASC`). */
  def similarityJoin(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries))
      .withColumn("sim", VectorOps.cosine6(col(vecCol), col("qvec")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("qvec")
  }

  /** Block-partitioned similarity join — the scale path when the query
    * side is too large to broadcast. The corpus is split into `blocks`
    * deterministic hash blocks; queries replicate once per block (an
    * explode, not a broadcast), the scored join shuffles on the block
    * id, and top-k resolves in two phases: local top-k inside each
    * (qid, block), then global top-k per qid over the k·blocks
    * survivors. Neither side ever needs to fit on one node; the shuffle
    * carries each query row `blocks` times and each corpus row once. */
  def similarityJoinBlocked(corpus: DataFrame, queries: DataFrame, k: Int,
                            blocks: Int,
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val blockedCorpus = corpus.withColumn("__block",
      pmod(hash(col(idCol)), lit(blocks)))
    val replicatedQueries = queries.withColumn("__block",
      explode(sequence(lit(0), lit(blocks - 1))))
    val scored = blockedCorpus.join(replicatedQueries, Seq("__block"))
      .withColumn("sim", VectorOps.cosine6(col(vecCol), col("qvec")))
    val wLocal = Window.partitionBy(col("qid"), col("__block"))
      .orderBy(col("sim").desc, col(idCol).asc)
    val wGlobal = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col(idCol).asc)
    scored
      .withColumn("__lr", row_number().over(wLocal))
      .filter(col("__lr") <= k)
      .withColumn("rank", row_number().over(wGlobal))
      .filter(col("rank") <= k)
      .drop("__lr", "__block", "qvec")
  }

  /** Rank-ordered concatenation of the top-k texts with the reference's
    * separator `"\n---\n"` (`/root/reference/App.tsx:192`). Shuffle-safe:
    * order is carried inside the collected structs, not assumed from row
    * order. Input needs columns (sim, id, text-ish). */
  def contextAgg(topK: DataFrame, idCol: Column, textCol: Column, simCol: Column): DataFrame =
    topK
      .agg(collect_list(struct((-simCol).as("nsim"), idCol.as("id"), textCol.as("text"))).as("rows"))
      .select(array_join(transform(sort_array(col("rows")), r => r.getField("text")), "\n---\n").as("context"))

  /** Per-query [[contextAgg]] — the batch-RAG form: one context row
    * per `qid`, the same rank-ordered concat with order carried
    * inside the collected structs (shuffle-safe). Per-group state is
    * bounded by the retrieval depth k, not the corpus. */
  def contextAggBatch(topK: DataFrame, idCol: Column, textCol: Column,
                      simCol: Column): DataFrame =
    topK
      .groupBy(col("qid"))
      .agg(collect_list(struct((-simCol).as("nsim"), idCol.as("id"),
        textCol.as("text"))).as("rows"))
      .select(col("qid"),
        array_join(transform(sort_array(col("rows")),
          r => r.getField("text")), "\n---\n").as("context"))

  /** Prompt assembly — VERBATIM parity with the reference's template
    * literal (`/root/reference/services/geminiService.ts:80-88`):
    * instruction sentence, blank line, `Context:` with `---` fences
    * around the context, blank line, `Question: ` inline, trailing
    * newline. */
  def prompt(context: Column, question: Column): Column =
    format_string(
      "Based on the following context, please provide a comprehensive answer to the user's question. If the context does not contain the answer, state that you cannot find the answer in the provided document.\n\nContext:\n---\n%s\n---\n\nQuestion: %s\n",
      context, question)
}
