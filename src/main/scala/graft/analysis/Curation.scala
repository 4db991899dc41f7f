package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Curation-funnel thresholds. The defaults are the values tuned so
  * every branch fires on the synthetic corpus (they parameterize the
  * `curation_keep` oracle query); a real pipeline sets its own from a
  * labeled sample. */
final case class CurationThresholds(
    minQuality: Double = 0.45,
    maxDupWordFrac: Double = 0.65,
    maxTop2Frac: Double = 0.12)

/** The curation keep/drop endpoint: one decision row per document from
  * the verified quality signals (composite quality score + Gopher
  * repetition), with a deterministic FIRST-failing reason — the
  * training-data funnel's final gate. All comparisons run on the
  * round-6 signal values, so the decision reproduces cross-engine
  * exactly. Per-row after two verified signal computations; no extra
  * shuffle beyond theirs. */
object Curation {

  def keep(docs: DataFrame, idCol: String, textCol: String,
           t: CurationThresholds = CurationThresholds()): DataFrame = {
    val rep = TextAnalysis.repetitionStats(docs, idCol, textCol)
    val qual = docs.select(col(idCol),
      TextAnalysis.qualityScore(col(textCol)).as("qscore"))
    val reason = when(col("qscore") < t.minQuality, "low_quality")
      .when(col("dup_word_frac") > t.maxDupWordFrac, "repetitive_words")
      .when(col("top2_frac") > t.maxTop2Frac, "repetitive_bigram")
      .otherwise("ok")
    qual.join(rep, Seq(idCol))
      .select(col(idCol), reason.as("reason"),
        when(reason === "ok", 1L).otherwise(0L).as("keep"))
  }
}
