package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language model for perplexity-style quality
  * scoring — the classic KenLM-shaped filter (Wenzek et al., CCNet,
  * public): documents whose token transitions are improbable under the
  * corpus itself are junk candidates (boilerplate, mojibake, spam).
  *
  * Model: add-k smoothed conditional
  * `P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V)` with unigram/bigram
  * counts and vocabulary size V all computed from the scored corpus in
  * the same job. Score = mean −ln P over a document's bigrams (its
  * "surprisal"; exp of it is perplexity). Documents with < 2 tokens
  * score 0.
  *
  * Scale shape: the model is DATA, not driver state — bigram counts at
  * 100 TB do not fit a broadcast, so scoring joins doc-bigram rows to
  * the count tables on their natural keys ((w1,w2) then w1): keyed
  * shuffles of fixed-width rows end to end. V is the one scalar and
  * rides a 1-row broadcast. Both count aggregates are partial+final
  * (map-side combined). No collect, no broadcast of unbounded state.
  *
  * Float parity: ln/÷ evaluate in double with the same expression
  * shape as the DuckDB oracle; the per-document mean absorbs sub-ulp
  * reduction-order drift in the project-wide round-6 contract.
  */
object LangModel {

  /** Per-document mean bigram surprisal over `docs`, smoothing `k`.
    * Output: (doc_id, surprisal) — rounded 6, total order on doc_id
    * left to the caller. */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
                      k: Double = 0.5): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("ts"))
    val nBi = greatest(size(col("ts")) - 1, lit(0))
    val docBi = toks.select(col("doc_id"),
        explode(zip_with(slice(col("ts"), lit(1), nBi), slice(col("ts"), lit(2), nBi),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val biCounts = docBi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val uniCounts = toks.select(explode(col("ts")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val vocab = uniCounts.agg(count(lit(1)).cast("double").as("v"))
    val scored = docBi
      .join(biCounts, Seq("w1", "w2"))
      .join(uniCounts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        (-log((col("cb") + lit(k)) / (col("cu") + lit(k) * col("v")))).as("nll"))
      .groupBy(col("doc_id")).agg(avg(col("nll")).as("s"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), round(coalesce(col("s"), lit(0.0)), 6).as("surprisal"))
  }
}
