package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Corpus-distribution drift metrics — "did this month's crawl change
  * under us?" A training pipeline re-ingesting a source needs a cheap,
  * scalar alarm for distribution shift BEFORE spending a full retrain
  * or re-curation pass; the classic signal is the KL divergence of the
  * unigram token distributions (the same statistic language-ID and
  * domain-shift monitors are built on).
  *
  * Reference analogue: the reference re-uploads a corpus wholesale and
  * trusts it blindly (`/root/reference/App.tsx:41` resets, then
  * re-adds) — this is the measurable form of "is the new corpus the
  * same kind of text?".
  */
object CorpusDrift {

  /** KL(P‖Q) of the add-one-smoothed unigram distributions of corpus
    * `a` (P) vs corpus `b` (Q), over the UNION vocabulary V:
    * `P(t) = (count_a(t)+1) / (tokens_a+|V|)` and likewise Q, so a
    * term absent from one side contributes its smoothed mass instead
    * of a log-of-zero. Returns one row:
    * `(vocab, tokens_a, tokens_b, kl)` with `kl` rounded to 6.
    *
    * Scale shape: two token-keyed count reduces (map-side partial),
    * one full-outer equi-join on the term, a 1-row broadcast of the
    * three totals, and a global sum — no per-row state beyond a term's
    * two counts, no driver-side data. Counts are exact integers, so
    * the smoothed arithmetic replays cross-engine; the final sum is
    * a double reduction rounded once at 6 (the engine-wide float
    * contract). */
  def unigramKl(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame, as: String) = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as(as))
    val joined = counts(a, "ca").join(counts(b, "cb"), Seq("t"), "full_outer")
      .select(col("t"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = joined.agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"),
      count(lit(1)).as("v"))
    joined.crossJoin(broadcast(tot))
      .withColumn("__p", (col("ca") + lit(1)) / (col("ta") + col("v")))
      .withColumn("__q", (col("cb") + lit(1)) / (col("tb") + col("v")))
      .agg(max(col("v")).as("vocab"), max(col("ta")).as("tokens_a"),
        max(col("tb")).as("tokens_b"),
        round(sum(col("__p") * log(col("__p") / col("__q"))), 6).as("kl"))
  }

  /** Population Stability Index of a NUMERIC column between a baseline
    * slice `a` and a current slice `b` — the numeric twin of
    * [[unigramKl]] and the standard production drift gate
    * (rule of thumb: < 0.1 stable, 0.1–0.25 watch, > 0.25 shifted).
    * Bins are `bins` equal-width buckets over the BASELINE's
    * [min, max] (the monitoring convention: the reference
    * distribution defines the grid); current-slice values outside the
    * baseline range clamp into the edge bins. Both histograms are
    * add-one smoothed (`(count+1)/(total+bins)`) so an empty bin never
    * feeds ln a zero. `PSI = Σ_bins (p_a − p_b)·ln(p_a / p_b)`,
    * rounded to 6. Returns one row `(n_a, n_b, psi)`.
    *
    * Scale shape: the (lo, hi) grid is a 1-row broadcast off the
    * baseline scan, bucketing is codegen'd floor arithmetic, the two
    * histograms are partial+final counts over `bins` keys, and the PSI
    * fold runs over the bins-row frame — two corpus scans total. */
  def psi(a: DataFrame, b: DataFrame, valueCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val bounds = a.agg(min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    def hist(df: DataFrame, as: String) = df.crossJoin(broadcast(bounds))
      .select(when(col("__hi") === col("__lo"), lit(0L))
        .otherwise(greatest(least(
          floor((col(valueCol).cast("double") - col("__lo")) /
            ((col("__hi") - col("__lo")) / lit(bins.toDouble))).cast("long"),
          lit(bins - 1L)), lit(0L)))
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(as))
    val joined = a.sparkSession.range(0, bins).select(col("id").as("bucket"))
      .join(hist(a, "ca"), Seq("bucket"), "left")
      .join(hist(b, "cb"), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = joined.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    joined.crossJoin(broadcast(tot))
      .withColumn("__pa", (col("ca") + lit(1)) / (col("na") + lit(bins)))
      .withColumn("__pb", (col("cb") + lit(1)) / (col("nb") + lit(bins)))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        round(sum((col("__pa") - col("__pb")) * log(col("__pa") / col("__pb"))), 6)
          .as("psi"))
  }
}
