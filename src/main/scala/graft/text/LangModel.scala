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

  /** Interpolated Kneser-Ney bigram surprisal (Kneser & Ney 1995; the
    * smoothing KenLM itself uses, upgrading [[bigramSurprisal]]'s
    * add-k): `P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·) +
    * D·N₁₊(w1,·)/c(w1·) · N₁₊(·,w2)/N₁₊(·,·)` — the continuation
    * probability ranks a word by how many CONTEXTS it follows, not how
    * often it occurs, which is what makes KN the standard for
    * perplexity-quality filtering (CCNet trains KenLM models for
    * exactly this gate). Trained on the scored corpus itself, so every
    * scored bigram has c ≥ 1 and no backoff-to-unseen path is needed
    * (the max() guard stays for composition with a discount ≥ 1).
    * Score = mean −ln P over a document's bigrams; < 2 tokens → 0.
    *
    * Scale shape identical to [[bigramSurprisal]]: the model is DATA
    * ((w1,w2) / w1 / w2-keyed count tables — never broadcast), scoring
    * is keyed joins; the one scalar (distinct-bigram total) rides a
    * 1-row broadcast. Float parity: the probability is one fixed
    * double chain mirrored shape-for-shape in the oracle; the per-doc
    * mean absorbs sub-ulp drift under the round-6 contract. */
  def knSurprisal(docs: DataFrame, idCol: String, textCol: String,
                  discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"KN discount in (0,1): $discount")
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("ts"))
    val nBi = greatest(size(col("ts")) - 1, lit(0))
    val docBi = toks.select(col("doc_id"),
        explode(zip_with(slice(col("ts"), lit(1), nBi), slice(col("ts"), lit(2), nBi),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bi = docBi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    // context mass and fan-out from the BIGRAM table (not raw unigram
    // counts: a document's final token heads no bigram)
    val ctx = bi.groupBy(col("w1"))
      .agg(sum(col("cb")).as("cx"), count(lit(1)).as("n1f"))
    val cont = bi.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val totBi = bi.agg(count(lit(1)).cast("double").as("t"))
    val scored = docBi
      .join(bi, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .join(cont, Seq("w2"))
      .crossJoin(broadcast(totBi))
      .select(col("doc_id"),
        (-log(
          greatest(col("cb") - lit(discount), lit(0.0)) / col("cx") +
            lit(discount) * col("n1f") / col("cx") * (col("n1b") / col("t"))))
          .as("nll"))
      .groupBy(col("doc_id")).agg(avg(col("nll")).as("s"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), round(coalesce(col("s"), lit(0.0)), 6).as("surprisal"))
  }

  /** CCNet-style perplexity BUCKETS (Wenzek et al. 2020 §4.3): each
    * language's documents split into head / middle / tail at the
    * per-language surprisal tertiles — CCNet's actual published
    * output shape (per-language cuts, because perplexity scales are
    * not comparable across languages). Cuts are EXACT interpolated
    * percentiles (round-6 before the compare, so the boundary
    * decision replays); `head` = lowest surprisal (the cleanest
    * third). Returns one row per (lang, bucket) with the doc count
    * and the two cut values.
    *
    * Scale shape: the KN scoring above + one exact-percentile
    * aggregate per language (k-row cut table broadcast back) + one
    * keyed count. At 100 TB swap the exact percentile for
    * `approx_percentile` — the documented [[graft.analysis.Quantiles]]
    * trade. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String,
                        discount: Double = 0.75): DataFrame = {
    val scored = knSurprisal(docs, idCol, textCol, discount)
    val withLang = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"))
      .join(scored, Seq("doc_id"))
    val cuts = withLang.groupBy(col("lang")).agg(
      round(expr(s"percentile(surprisal, ${1.0 / 3})"), 6).as("cut_head"),
      round(expr(s"percentile(surprisal, ${2.0 / 3})"), 6).as("cut_middle"))
    withLang.join(broadcast(cuts), Seq("lang"))
      .select(col("lang"), col("cut_head"), col("cut_middle"),
        when(col("surprisal") <= col("cut_head"), "head")
          .when(col("surprisal") <= col("cut_middle"), "middle")
          .otherwise("tail").as("bucket"))
      .groupBy(col("lang"), col("bucket"), col("cut_head"), col("cut_middle"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("lang"), col("bucket"), col("n_docs"),
        col("cut_head"), col("cut_middle"))
  }

  /** Multinomial Naive Bayes language identifier, trained on a labeled
    * split and scored on a held-out split — the TRAINED upgrade of the
    * n-gram heuristic (`TextAnalysis.langId`), with the same shape as
    * the `langid_confusion` gate: per-class test accuracy out.
    *
    * Model (token unigrams, add-one smoothing):
    * `P(t|lang) = (c_lt + 1) / (n_l + V)`, prior = doc share. A test
    * token absent from the training vocabulary is IGNORED (dropped by
    * the inner join onto the model — the standard closed-vocabulary
    * convention; it contributes the same unknown-mass to every class
    * anyway under shared smoothing).
    *
    * Determinism: each per-term log-likelihood addend
    * `count · ln(P(t|lang))` is one fixed double chain, CAST TO
    * DECIMAL(38,12) and summed exactly (the Spectral pattern — decimal
    * addition is associative, so per-doc scores are reduction-order
    * free and bit-identical cross-engine); argmax ties break lang ASC.
    *
    * Scale shape: the model is DATA keyed by term (vocab × |langs|
    * rows — never broadcast); scoring is one term-keyed join plus one
    * (doc, lang)-keyed aggregate. Priors and V are k-row/1-row
    * broadcasts. No driver state beyond those scalars.
    *
    * @return per true language: `lang, n_test, n_correct, accuracy`
    */
  def nbLangId(train: DataFrame, test: DataFrame, idCol: String,
               textCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 12))
    val trTok = train.select(col(labelCol).as("lang"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tc = trTok.groupBy(col("lang"), col("term")).agg(count(lit(1)).as("c"))
    val nl = trTok.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    val vocab = trTok.select(col("term")).distinct()
    val vSize = vocab.agg(count(lit(1)).as("v"))
    val priors = train.groupBy(col(labelCol).as("lang"))
      .agg(count(lit(1)).as("n_docs"))
    val nTotal = train.agg(count(lit(1)).as("n_total"))
    val model = vocab.crossJoin(broadcast(nl))
      .join(tc, Seq("lang", "term"), "left_outer")
      .crossJoin(broadcast(vSize))
      .select(col("lang"), col("term"),
        // round-6 BEFORE the decimal arithmetic: ln is not guaranteed
        // correctly rounded on either engine; 6 dp is far below any
        // meaningful likelihood difference and makes every addend an
        // exactly-agreed value
        round(log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (col("n_l") + col("v")).cast("double")), 6).as("lp"))
    val teTok = test.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("cnt"))
    val sums = teTok.join(model, Seq("term"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(dec(col("cnt").cast("double") * col("lp"))).as("s"))
    val lpriors = priors.crossJoin(nTotal)
      .select(col("lang"),
        round(log(col("n_docs").cast("double") / col("n_total").cast("double")), 6)
          .as("lprior"))
    val grid = test.select(col(idCol).as("doc_id"), col(labelCol).as("true_lang"))
      .crossJoin(broadcast(lpriors))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("lang").asc)
    val pred = grid.join(sums, Seq("doc_id", "lang"), "left_outer")
      .select(col("doc_id"), col("true_lang"), col("lang"),
        (dec(col("lprior")) + coalesce(col("s"), dec(lit(0.0)))).as("score"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    pred.groupBy(col("true_lang"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("lang") === col("true_lang"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("true_lang").as("lang"), col("n_test"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n_test").cast("double"), 6)
          .as("accuracy"))
  }
}
