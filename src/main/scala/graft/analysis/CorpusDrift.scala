package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** [[psi]] unrolled into a MONITORING TREND: one PSI value per
    * calendar week against the FIRST week's distribution (bins fixed
    * from the baseline week's [min,max], out-of-range weeks clamp into
    * edge bins — the monitoring convention), so drift becomes a series
    * a dashboard can alarm on instead of a single after-the-fact
    * scalar. The baseline week scores 0 against itself — a built-in
    * self-check row.
    *
    * Scale shape: ONE scan buckets every row (never a per-week psi()
    * call), one (week, bucket) reduce, then the PSI fold over the
    * weeks × bins grid — bounded rows, baseline counts joined by
    * bucket. */
  def psiTrend(df: DataFrame, tsCol: String, valueCol: String,
               bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val wk = df.select(date_trunc("week", col(tsCol)).cast("date").as("week"),
      col(valueCol).cast("double").as("v"))
    val w0 = wk.agg(min(col("week")).as("__w0"))
    val bounds = wk.crossJoin(broadcast(w0))
      .filter(col("week") === col("__w0"))
      .agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
    val bucketed = wk.crossJoin(broadcast(bounds))
      .select(col("week"),
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(greatest(least(
            floor((col("v") - col("__lo")) /
              ((col("__hi") - col("__lo")) / lit(bins.toDouble))).cast("long"),
            lit(bins - 1L)), lit(0L))).as("bucket"))
    val cwb = bucketed.groupBy(col("week"), col("bucket"))
      .agg(count(lit(1)).as("__c"))
    val grid = wk.select(col("week")).distinct()
      .crossJoin(df.sparkSession.range(0, bins).select(col("id").as("bucket")))
    val fill = grid.join(cwb, Seq("week", "bucket"), "left")
      .select(col("week"), col("bucket"), coalesce(col("__c"), lit(0L)).as("cb"))
    val basec = fill.crossJoin(broadcast(w0))
      .filter(col("week") === col("__w0"))
      .select(col("bucket"), col("cb").as("ca"))
    val na = basec.agg(sum(col("ca")).as("__na"))
    val nbs = fill.groupBy(col("week")).agg(sum(col("cb")).as("__nb"))
    fill.join(basec, Seq("bucket"))
      .join(nbs, Seq("week"))
      .crossJoin(broadcast(na))
      .withColumn("__pa", (col("ca") + lit(1)) / (col("__na") + lit(bins)))
      .withColumn("__pb", (col("cb") + lit(1)) / (col("__nb") + lit(bins)))
      .groupBy(col("week"))
      .agg(max(col("__nb")).as("n"),
        round(sum((col("__pa") - col("__pb")) * log(col("__pa") / col("__pb"))), 6)
          .as("psi"))
      .select(date_format(col("week"), "yyyy-MM-dd").as("week"),
        col("n"), col("psi"))
  }

  /** Chi-square homogeneity test of a CATEGORICAL column between two
    * slices — the categorical companion of [[psi]] (which needs a
    * numeric grid): "is the label/language/source mix of slice `b`
    * the same distribution as slice `a`". Standard two-way test:
    * expected cell = rowTotal·sliceTotal/grandTotal,
    * `χ² = Σ_cells (obs − exp)²/exp`, dof = |categories| − 1. A χ²
    * far above dof (≈ dof + 4·√(2·dof)) rejects homogeneity. One row:
    * `(n_a, n_b, n_categories, chi2)`. Counts are exact longs; the
    * per-cell float chain is fixed-order IEEE and the category fold
    * rounds once at 6 (the unigramKl summation precedent). An empty
    * slice has no distribution — chi2 is null.
    *
    * Scale shape: one category-keyed conditional-count reduce over
    * both slices, a 1-row totals broadcast, a |categories|-row fold. */
  def chiSquareDrift(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    val counts = a.select(col(catCol).as("__cat"), lit(1L).as("__ia"), lit(0L).as("__ib"))
      .unionByName(
        b.select(col(catCol).as("__cat"), lit(0L).as("__ia"), lit(1L).as("__ib")))
      .groupBy(col("__cat"))
      .agg(sum(col("__ia")).as("ca"), sum(col("__ib")).as("cb"))
    val tot = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val grand = (col("na") + col("nb")).cast("double")
    val rowTot = (col("ca") + col("cb")).cast("double")
    val ea = rowTot * col("na") / grand
    val eb = rowTot * col("nb") / grand
    // a zero expected cell only happens when a whole slice is empty
    // (row totals are positive by construction) — the output is null
    // then, but the per-row division must still not evaluate: when()
    // is lazy, sum(child) is not
    val cell = when(ea === 0.0 || eb === 0.0, lit(0.0))
      .otherwise((col("ca") - ea) * (col("ca") - ea) / ea +
        (col("cb") - eb) * (col("cb") - eb) / eb)
    counts.crossJoin(broadcast(tot))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        count(lit(1)).as("n_categories"),
        when(max(col("na")) === 0L || max(col("nb")) === 0L,
          lit(null).cast("double"))
          .otherwise(round(sum(cell), 6)).as("chi2"))
  }

  /** Binned two-sample Kolmogorov–Smirnov statistic — the max CDF gap
    * between two slices of a numeric column over a fixed-width bucket
    * grid: the third drift gate next to [[psi]] (which sums
    * per-bin divergence — KS catches a localized shift PSI averages
    * away) and [[chiSquareDrift]] (categorical). Binned by the same
    * `floor(value/width)` arithmetic as the quantile sketch, so the
    * statistic is exact FOR THE BINNED distributions and within one
    * bin's mass of the continuous KS — `width` is the resolution
    * knob. Returns one row `(n_a, n_b, ks)`; an empty slice → null.
    *
    * Determinism: cumulative counts are exact integer window sums
    * over BUCKET rows in bucket order; each CDF value is one integer
    * division pair and the gap rounds to 6 before the max.
    *
    * Scale shape: bucket-keyed counts (map-side combined), then ONE
    * unpartitioned window — bounded by O(range/width) bucket rows,
    * never data rows (the histogramQuantiles contract; WinScan
    * allowlisted on that bound). */
  def ksStatistic(a: DataFrame, b: DataFrame, valueCol: String,
                  width: Double): DataFrame = {
    require(width > 0.0, s"width > 0: $width")
    def bucketed(df: DataFrame, ia: Long, ib: Long) = df
      .filter(col(valueCol).isNotNull)
      .select(floor(col(valueCol) / lit(width)).cast("long").as("__b"),
        lit(ia).as("__ia"), lit(ib).as("__ib"))
    val counts = bucketed(a, 1L, 0L).unionByName(bucketed(b, 0L, 1L))
      .groupBy(col("__b"))
      .agg(sum(col("__ia")).as("ca"), sum(col("__ib")).as("cb"))
    val tot = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val wCum = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // per-row lazy guard: with a slice empty the output is null, but
    // the per-bucket CDF division must not evaluate (ANSI divide)
    val gap = when(col("na") === 0L || col("nb") === 0L, lit(0.0))
      .otherwise(round(abs(
        col("__cuma").cast("double") / col("na") -
          col("__cumb").cast("double") / col("nb")), 6))
    counts
      .withColumn("__cuma", sum(col("ca")).over(wCum))
      .withColumn("__cumb", sum(col("cb")).over(wCum))
      .crossJoin(broadcast(tot))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        when(max(col("na")) === 0L || max(col("nb")) === 0L,
          lit(null).cast("double"))
          .otherwise(max(gap)).as("ks"))
  }

  /** Gini concentration of corpus mass over a key — "how unequal is
    * the per-source (or per-language, per-domain) contribution":
    * G = Σ_i (2i − n − 1)·x_(i) / (n·Σx) over counts sorted ascending
    * (ties broken on the key — rank determinism). 0 = perfectly even,
    * → 1 = one key dominates; the data-governance scalar behind
    * source caps and temperature mixing. One row
    * `(n_keys, total, gini)`. EVERYTHING except the single final
    * division is exact integer arithmetic — no float order anywhere.
    *
    * Scale shape: key-keyed count reduce, then one unpartitioned rank
    * window over |keys| rows (bounded by key cardinality, the WinScan
    * allowlist argument) and an integer fold. */
  def giniConcentration(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__x"))
    val tot = counts.agg(count(lit(1)).as("__n"), sum(col("__x")).as("__t"))
    val w = Window.orderBy(col("__x").asc, col(keyCol).asc)
    counts
      .withColumn("__i", row_number().over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .agg(max(col("__n")).as("n_keys"), max(col("__t")).as("total"),
        sum((lit(2L) * col("__i") - col("__n") - lit(1L)) * col("__x")).as("__num"))
      .select(col("n_keys"), col("total"),
        round(col("__num").cast("double") /
          (col("n_keys") * col("total")).cast("double"), 6).as("gini"))
  }

  /** Benford first-digit test of a positive numeric column — the
    * fabricated-data forensic (invoice fraud, synthetic-metric
    * detection): naturally-occurring multi-scale magnitudes put digit
    * d first with probability `log10(1 + 1/d)`; flat or spiky digit
    * histograms are the red flag. One row per digit 1–9 with the
    * observed count/frequency, the Benford expectation, and the
    * round-6 deviation.
    *
    * Digit extraction is ENGINE-PORTABLE by construction: the value
    * scales to an exact integer (`round(x · 10^scale)` — pick `scale`
    * to cover the column's precision, e.g. 2 for prices) and the
    * first digit comes from the INTEGER's decimal string — integers
    * print identically everywhere, unlike doubles, and
    * `floor(log10(x))` misbins exact powers of ten under libm. Null
    * and non-positive values are excluded (Benford is defined on
    * positive magnitudes). */
  def benfordDigits(df: DataFrame, valueCol: String, scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale in [0,9]: $scale")
    val cents = round(col(valueCol) * math.pow(10.0, scale).toLong, 0).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("long")
    val counts = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__t"))
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("__t"), 6).as("freq"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("benford_p"),
        round(col("n").cast("double") / col("__t") -
          log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("deviation"))
  }

  /** Distinctive terms between two corpus slices — the log-odds-ratio
    * with an informative Dirichlet prior (Monroe, Colaresi & Quinn,
    * "Fightin' Words", Political Analysis 16(4) 2008 — public), the
    * statistically-sound form of "what words characterize A vs B"
    * (naive tf-diff over-weights common words; plain log-odds
    * over-weights rare ones). Per term w with counts `y_aw`, `y_bw`,
    * totals `n_a`, `n_b`, and prior `α_w = α0 · (y_aw+y_bw)/(n_a+n_b)`
    * (prior mass proportional to overall frequency, Σα_w = α0):
    *
    *   δ_w = ln((y_aw+α_w)/(n_a+α0−y_aw−α_w)) − ln((y_bw+α_w)/(n_b+α0−y_bw−α_w))
    *   z_w = δ_w / sqrt(1/(y_aw+α_w) + 1/(y_bw+α_w))
    *
    * Positive z → characteristic of `a`, negative → of `b`; output is
    * the `topK` terms by |z| (z round-6 first — the float contract;
    * ties by term). Counts are exact longs and the totals a 1-row
    * broadcast, so the float chain is a fixed IEEE sequence both
    * engines replay; the round-6 absorbs libm ln/sqrt drift except
    * within 5e-7 of a rank boundary (the documented exposure class).
    *
    * Scale shape: one token-keyed conditional-count reduce over the
    * two slices (map-side partial), a 1-row totals broadcast, and a
    * TakeOrdered top-k — no join wider than |vocab| rows, no window. */
  def logOddsTerms(docs: DataFrame, textCol: String, groupCol: String,
                   a: String, b: String, alpha0: Double, topK: Int): DataFrame = {
    require(alpha0 > 0.0, s"alpha0 must be positive: $alpha0")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val counts = docs.filter(col(groupCol).isin(a, b))
      .select(col(groupCol).as("__g"), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(sum(when(col("__g") === a, 1L).otherwise(0L)).as("ya"),
        sum(when(col("__g") === b, 1L).otherwise(0L)).as("yb"))
    val tot = counts.agg(sum(col("ya")).as("na"), sum(col("yb")).as("nb"))
    val aw = lit(alpha0) * (col("ya") + col("yb")).cast("double") /
      (col("na") + col("nb")).cast("double")
    val delta =
      log((col("ya") + aw) / (col("na") + lit(alpha0) - col("ya") - aw)) -
        log((col("yb") + aw) / (col("nb") + lit(alpha0) - col("yb") - aw))
    val z = delta / sqrt(lit(1.0) / (col("ya") + aw) + lit(1.0) / (col("yb") + aw))
    counts.crossJoin(broadcast(tot))
      .withColumn("z", round(z, 6))
      .orderBy(abs(col("z")).desc, col("term").asc)
      .limit(topK)
      .select(col("term"), col("ya"), col("yb"), col("z"))
  }
}
