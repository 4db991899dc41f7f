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

  /** k-anonymity audit over a quasi-identifier column set (Sweeney
    * 2002) — the re-identification gate a PII scrub alone misses:
    * a released row is k-anonymous when at least k−1 OTHER rows share
    * its full quasi-identifier combination, so any combination held
    * by fewer than `k` rows is a linkage risk. Reports each violating
    * combination with its population (ascending — rarest, most
    * identifying, first). NULL is treated as its own value (two nulls
    * share a group — `groupBy` semantics, matching SQL `GROUP BY`).
    *
    * Scale shape: ONE keyed reduce on the quasi-identifier tuple
    * (map-side combined) and a filter — the audit costs one shuffle
    * of |distinct combinations| partial rows regardless of table
    * size. */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "at least one quasi-identifier column")
    require(k >= 2, s"k >= 2: $k")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
      .orderBy(col("group_size").asc +: quasiIds.map(col(_).asc): _*)
  }
}
