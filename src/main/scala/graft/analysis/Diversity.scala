package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.text.TextAnalysis

/** Corpus-diversity gates — the lexical-health counterpart of the
  * [[CorpusDrift]] family. A healthy natural corpus is Zipfian and
  * lexically varied; a crawl dominated by templated or machine-generated
  * text flattens or steepens the rank-frequency law, collapses n-gram
  * diversity (the distinct-n metric generation eval uses), and drops
  * per-source vocabulary entropy. All three surface here as replayable
  * scalars.
  *
  * Determinism: every cross-row float sum carries DECIMAL(38,12)
  * addends (associative — reduction-order free, the Spectral pattern);
  * `ln` outputs round to 6 dp BEFORE entering sums where the sum feeds
  * cancellation-amplifying arithmetic (the OLS normal equations).
  * Scale shape: term/gram counts are map-side-combined keyed reduces;
  * the Zipf regression runs over a TakeOrdered top-N (the one bounded
  * ≤ N-row window, rrfFuse class); nothing unbounded reaches the
  * driver or a broadcast.
  */
object Diversity {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 12))

  /** Least-squares slope of `ln(freq)` on `ln(rank)` over the corpus's
    * `topN` most frequent tokens (Zipf's law predicts ≈ −1 on natural
    * text; |slope| far from 1 flags templated or synthetic mixes).
    * Ranks order by (count DESC, term ASC) — total and cross-engine
    * identical. One row: `(n_terms, slope, intercept)`, round-6.
    */
  def zipfSlope(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    require(topN >= 2, s"need topN >= 2, got $topN")
    val tc = docs.select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val top = tc.orderBy(col("c").desc, col("term").asc).limit(topN)
    // rank window sorts <= topN rows — bounded, never the corpus
    val ranked = top.withColumn("r",
        row_number().over(Window.orderBy(col("c").desc, col("term").asc)))
      .select(round(log(col("r").cast("double")), 6).as("x"),
        round(log(col("c").cast("double")), 6).as("y"))
    val m = ranked.agg(
      count(lit(1)).cast("double").as("n"),
      sum(dec(col("x"))).cast("double").as("sx"),
      sum(dec(col("y"))).cast("double").as("sy"),
      sum(dec(col("x") * col("y"))).cast("double").as("sxy"),
      sum(dec(col("x") * col("x"))).cast("double").as("sxx"))
    m.select(col("n").cast("long").as("n_terms"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
      round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
        col("n"), 6).as("intercept"))
  }

  /** Per-stratum n-gram diversity: distinct token n-grams over total
    * token n-grams (the distinct-n metric; 1.0 = every n-gram unique,
    * low values = repetitive/templated text). Grams are the portable
    * polynomial shingle hashes — identical cross-engine, and a mod-p
    * collision (deterministic, replayed) costs the same count on both
    * sides. Keyed reduce; integer arithmetic until the final ratio. */
  def distinctNgramRatio(docs: DataFrame, strataCol: String,
                         textCol: String, n: Int): DataFrame =
    docs.select(col(strataCol),
        explode(graft.functions.TokenShingleHashes(col(textCol), n)).as("g"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_grams"),
        count_distinct(col("g")).as("n_distinct"))
      .select(col(strataCol), col("n_grams"), col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_grams").cast("double"), 6)
          .as("ratio"))

  /** Per-stratum Shannon entropy of the token distribution, plus the
    * vocabulary-size-normalized form (entropy / ln|V| ∈ [0,1] — 1 =
    * uniform usage, → 0 = a few tokens dominate). Addends
    * `−p·ln p` ride DECIMAL(38,12); a single-token vocabulary
    * normalizes to 0 explicitly (0/0 guard). */
  def termEntropy(docs: DataFrame, strataCol: String,
                  textCol: String): DataFrame = {
    val tc = docs.select(col(strataCol),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col(strataCol), col("term")).agg(count(lit(1)).as("c"))
    val tot = tc.groupBy(col(strataCol))
      .agg(sum(col("c")).as("nt"), count(lit(1)).as("v"))
    tc.join(tot, Seq(strataCol))
      .select(col(strataCol), col("v"),
        dec(-(col("c").cast("double") / col("nt").cast("double")) *
          log(col("c").cast("double") / col("nt").cast("double"))).as("a"))
      .groupBy(col(strataCol), col("v"))
      .agg(sum(col("a")).cast("double").as("h"))
      .select(col(strataCol), col("v").as("n_vocab"),
        round(col("h"), 6).as("entropy"),
        when(col("v") <= 1L, lit(0.0))
          .otherwise(round(col("h") / log(col("v").cast("double")), 6))
          .as("norm_entropy"))
  }
}
