package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scale text-similarity metrics for generation/paraphrase
  * evaluation — BLEU (Papineni et al. 2002), the metric an LLM data
  * pipeline runs when it compares a rewritten/cleaned/generated text
  * against its source at scale (paraphrase mining audits, decontam
  * spot checks, distillation QA).
  *
  * [[bleu2]] is sentence-level BLEU with n ∈ {1, 2}: clipped n-gram
  * precision `p_n = Σ min(c_cand, c_ref) / Σ c_cand`, brevity penalty
  * `BP = min(1, e^(1 − ref_len/cand_len))`, score
  * `BP · exp((ln p₁ + ln p₂)/2)` — 0 when either precision is 0 (the
  * standard convention, avoiding ln 0). Grams are the engine's
  * portable token-shingle hashes, so the whole computation — counts,
  * clipping, the fixed ln/exp chain — replays in SQL; precisions and
  * BP round to 6 dp before the chain (the cross-engine float
  * contract).
  *
  * Scale shape: gram rows explode once per side, counts reduce keyed
  * by (pair, gram), clipping is one left join, and the per-pair
  * reduction is O(grams of that pair) — no cross-pair state, nothing
  * driver-side. A document shorter than n contributes its truncated
  * shingle (the [[graft.functions.TokenShingleHashes]] convention,
  * deterministic on both engines).
  */
object TextEval {

  private def grams(df: DataFrame, idCol: String, textCol: String,
                    n: Int, side: String): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(graft.functions.TokenShingleHashes(col(textCol), n)).as("gram"))
      .groupBy(col("__id"), col("gram"))
      .agg(count(lit(1)).as(side))

  /** Clipped n-gram precision per pair id. */
  private def precision(pairs: DataFrame, idCol: String, candCol: String,
                        refCol: String, n: Int, out: String): DataFrame = {
    val c = grams(pairs, idCol, candCol, n, "cc")
    val r = grams(pairs, idCol, refCol, n, "cr")
    c.join(r, Seq("__id", "gram"), "left_outer")
      .groupBy(col("__id"))
      .agg(round(sum(least(col("cc"), coalesce(col("cr"), lit(0L))))
        .cast("double") / sum(col("cc")).cast("double"), 6).as(out))
  }

  /** Sentence-level BLEU-2 per pair: `(idCol, p1, p2, bp, bleu2)`,
    * all round-6. `pairs` carries one candidate and one reference
    * text per row. */
  def bleu2(pairs: DataFrame, idCol: String, candCol: String,
            refCol: String): DataFrame = {
    val p1 = precision(pairs, idCol, candCol, refCol, 1, "p1")
    val p2 = precision(pairs, idCol, candCol, refCol, 2, "p2")
    val lens = pairs.select(col(idCol).as("__id"),
      TextAnalysis.tokenCount(col(candCol)).cast("double").as("__cl"),
      TextAnalysis.tokenCount(col(refCol)).cast("double").as("__rl"))
    lens.join(p1, Seq("__id")).join(p2, Seq("__id"))
      .select(col("__id").as(idCol), col("p1"), col("p2"),
        round(least(lit(1.0),
          exp(lit(1.0) - col("__rl") / col("__cl"))), 6).as("bp"))
      .withColumn("bleu2",
        when(col("p1") > 0 && col("p2") > 0,
          round(col("bp") * exp((log(col("p1")) + log(col("p2"))) / lit(2.0)), 6))
          .otherwise(lit(0.0)))
  }

  /** ROUGE-L per pair (Lin 2004) — BLEU's recall-oriented sibling:
    * the longest common SUBSEQUENCE between candidate and reference
    * (order-preserving but gap-tolerant, so a faithful-but-compressed
    * rewrite scores high where clipped n-grams punish every splice),
    * with P = LCS/|cand|, R = LCS/|ref|, and the β=1 F-measure.
    *
    * The LCS runs the classic DP entirely INSIDE the row as a nested
    * builtin-HOF fold — `aggregate` over candidate tokens carrying
    * the DP row, an inner `aggregate` over reference positions
    * building the next row (each cell = max(up, left, diag+match)) —
    * over the engine's portable token hashes, so the oracle replays
    * the identical fold with `list_reduce` (integer-only: LCS is
    * exact, no float contract needed until the final ratios).
    * O(|cand|·|ref|) per pair, zero cross-pair state — the same
    * corpus-scale shape as [[bleu2]]; pathological documents are the
    * caller's length-cap problem, as with every per-pair DP here
    * (edit_neardup's banded-Levenshtein precedent). */
  def rougeL(pairs: DataFrame, idCol: String, candCol: String,
             refCol: String): DataFrame = {
    val withH = pairs.select(col(idCol).as("__id"),
      graft.functions.TokenShingleHashes(col(candCol), 1).as("__ch"),
      graft.functions.TokenShingleHashes(col(refCol), 1).as("__rh"))
    val m = size(col("__rh"))
    val dp = aggregate(col("__ch"),
      transform(sequence(lit(0), m), _ => lit(0L)),
      (row, a) =>
        aggregate(sequence(lit(1), m), array(lit(0L)), (acc, j) =>
          concat(acc, array(greatest(
            element_at(row, j + 1),
            element_at(acc, size(acc)),
            element_at(row, j) +
              when(element_at(col("__rh"), j) === a, lit(1L))
                .otherwise(lit(0L)))))))
    // m == 0 guard: sequence(1, 0) would DESCEND in Spark — the empty
    // side short-circuits to LCS 0 before the fold is ever evaluated
    val lcs = when(size(col("__rh")) === 0 || size(col("__ch")) === 0, lit(0L))
      .otherwise(element_at(dp, size(col("__rh")) + 1))
    withH
      .select(col("__id").as(idCol), lcs.as("lcs"),
        size(col("__ch")).cast("long").as("__nc"),
        size(col("__rh")).cast("long").as("__nr"))
      .select(col(idCol), col("lcs"),
        when(col("__nc") === 0, lit(0.0))
          .otherwise(round(col("lcs").cast("double") / col("__nc"), 6))
          .as("rouge_p"),
        when(col("__nr") === 0, lit(0.0))
          .otherwise(round(col("lcs").cast("double") / col("__nr"), 6))
          .as("rouge_r"))
      .withColumn("rouge_f1",
        when(col("rouge_p") + col("rouge_r") === 0, lit(0.0))
          .otherwise(round(lit(2.0) * col("rouge_p") * col("rouge_r") /
            (col("rouge_p") + col("rouge_r")), 6)))
  }
}
