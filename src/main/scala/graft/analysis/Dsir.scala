package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus documents that look like a
  * TARGET distribution by importance weighting in a HASHED feature
  * space. Two bag-of-buckets unigram models (add-one smoothed) are
  * fit — one on the target slice, one on the full raw corpus — and
  * each document's log importance weight is the sum over its tokens
  * of `ln p_target(bucket) − ln p_raw(bucket)`. The hashing is the
  * published algorithm's memory bound: the model is `buckets` rows
  * regardless of vocabulary, so it broadcasts like centroids while
  * the token stream reduces once.
  *
  * This is the "make web data look like Wikipedia" selector of an LLM
  * data pipeline — the distribution-matching complement to the
  * quality gates ([[graft.text.LangModel.knSurprisal]] scores
  * fluency under the corpus's own LM; DSIR scores AFFINITY to a
  * chosen target slice).
  *
  * Determinism: bucket = portable polynomial token hash mod
  * `buckets` (the [[Contamination.tokenHashes]] family — replayed
  * with `list_reduce`/`ord` in the oracle); each bucket's log-ratio
  * rounds to 6 dp BEFORE the per-document sum, and the sums are
  * DECIMAL(38,12)-exact (the Spectral/NB pattern — decimal addition
  * is associative, so weights are reduction-order free and
  * bit-identical cross-engine).
  *
  * Scale shape: one tokenize pass (the target counts reuse it via
  * the predicate, not a second scan of text), two B-row aggregates,
  * a B-row broadcast model, one (doc, bucket)-keyed reduce. No
  * driver state beyond the B-row model and two scalars.
  */
object Dsir {

  /** Per-document DSIR log importance weight of every `corpus` row,
    * with the target distribution = rows satisfying `targetPred`
    * (a predicate over the corpus columns, e.g. `lang = 'en'` or a
    * curated-source marker). Returns `(idCol, weight)` for ALL rows
    * (tokenless documents weigh 0) — selection is the caller's
    * ranking; see [[selectTopK]]. */
  def logWeights(corpus: DataFrame, targetPred: Column, idCol: String,
                 textCol: String, buckets: Int = 256): DataFrame =
    scoreWithModel(corpus, trainModel(corpus, targetPred, idCol, textCol, buckets),
      idCol, textCol, buckets)

  /** Fit the B-row log-ratio model — `(b, lr)` for every bucket. The
    * model is the PERSISTABLE artifact of the production shape (train
    * once on a frozen corpus snapshot, gate every future ingest batch
    * with [[scoreWithModel]] — the frozen-centroid convention of the
    * index family): write it with plain parquet and read it back; no
    * state beyond these B rows exists. */
  def trainModel(corpus: DataFrame, targetPred: Column, idCol: String,
                 textCol: String, buckets: Int = 256): DataFrame = {
    require(buckets >= 2, s"buckets >= 2: $buckets")
    val spark = corpus.sparkSession
    val tb = corpus
      .select(col(idCol).as("__id"), targetPred.as("__tgt"),
        explode(Contamination.tokenHashes(col(textCol))).as("__h"))
      .select(col("__id"), col("__tgt"), pmod(col("__h"), lit(buckets.toLong)).as("b"))
    val tgt = tb.filter(col("__tgt")).groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val raw = tb.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val nt = tgt.agg(sum(col("ct")).as("n_t"))
    val nr = raw.agg(sum(col("cr")).as("n_r"))
    // the B-row smoothed log-ratio model: round-6 BEFORE the decimal
    // sums (ln is not correctly rounded on either engine; 6 dp is far
    // below any meaningful ratio difference)
    spark.range(buckets).select(col("id").as("b"))
      .join(tgt, Seq("b"), "left_outer")
      .join(raw, Seq("b"), "left_outer")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("b"),
        round(
          log((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") /
            (col("n_t") + lit(buckets.toLong)).cast("double")) -
            log((coalesce(col("cr"), lit(0L)) + lit(1L)).cast("double") /
              (col("n_r") + lit(buckets.toLong)).cast("double")), 6).as("lr"))
  }

  /** Score ANY document frame against a trained `(b, lr)` model —
    * the ingest-time half: a new batch weighs against the frozen
    * target/raw models without touching the training corpus.
    * `buckets` must be the trainer's (the bucket arithmetic must not
    * drift — same contract as the signature stores' config rows). */
  def scoreWithModel(docs: DataFrame, model: DataFrame, idCol: String,
                     textCol: String, buckets: Int): DataFrame = {
    def dec(c: Column) = c.cast(DecimalType(38, 12))
    val tb = docs
      .select(col(idCol).as("__id"),
        explode(Contamination.tokenHashes(col(textCol))).as("__h"))
      .select(col("__id"), pmod(col("__h"), lit(buckets.toLong)).as("b"))
    val perDoc = tb.groupBy(col("__id"), col("b")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(model), Seq("b"))
      .groupBy(col("__id"))
      .agg(sum(dec(col("cnt").cast("double") * col("lr"))).as("w"))
    docs.select(col(idCol))
      .join(perDoc.withColumnRenamed("__id", idCol), Seq(idCol), "left_outer")
      .select(col(idCol),
        round(coalesce(col("w").cast("double"), lit(0.0)), 6).as("weight"))
  }

  /** The top-`k` most target-like documents by [[logWeights]] —
    * DSIR's selection step with the engine total order
    * `(weight DESC, id ASC)`. (The paper resamples with Gumbel noise;
    * the deterministic top-k is the reproducible variant — compose
    * with [[Sampling]]'s weighted A-ES using `exp(weight)` for the
    * faithful stochastic form.) */
  def selectTopK(corpus: DataFrame, targetPred: Column, idCol: String,
                 textCol: String, buckets: Int, k: Int): DataFrame =
    logWeights(corpus, targetPred, idCol, textCol, buckets)
      .orderBy(col("weight").desc, col(idCol).asc)
      .limit(k)
}
