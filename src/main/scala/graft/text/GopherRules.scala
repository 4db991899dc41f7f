package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The two canonical published rule-based curation gates, as
  * per-row column pipelines (no shuffle — every rule is a string/list
  * expression, so the gate runs at scan speed and composes under the
  * scan's predicate pushdown):
  *
  *  - **Gopher rules** (Rae et al. 2021, Table A1): document-level
  *    repetition/format heuristics — word-count and mean-word-length
  *    bands, symbol-to-word ratio, bullet/ellipsis line fractions,
  *    alphabetic-word fraction, minimum stop-word presence. The
  *    published thresholds are defaults; every one is a parameter.
  *  - **C4 line cleaning** (Raffel et al. 2020 §2.2): LINE-level
  *    retention — keep lines that end in terminal punctuation and
  *    carry at least `minLineWords` words, drop lines with code/
  *    boilerplate markers; a document survives if at least
  *    `minKeptLines` lines remain.
  *
  * Both replay in SQL with split/replace/list arithmetic only — no
  * regex beyond a character class — so the oracles pin every rule
  * decision, not just the final verdict.
  */
object GopherRules {

  /** Occurrences of literal `sub` in `text` via the length-difference
    * identity — portable to any SQL engine with replace(). */
  private def countOccurrences(text: Column, sub: String): Column =
    (length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(sub), ""))) /
      lit(sub.length)

  /** Non-empty lines of the document (split on \n, trimmed). */
  private def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /** Gopher's Table-A1 document gate: one row per document with each
    * rule's boolean and the conjunction `keep`. Ratios round-6 before
    * their threshold compare (the project boundary contract). */
  def gopherQualityRules(docs: DataFrame, idCol: String, textCol: String,
                         minWords: Int = 50, maxWords: Int = 100000,
                         minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                         maxSymbolRatio: Double = 0.1,
                         maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
                         minAlphaFrac: Double = 0.8,
                         minStopwords: Int = 2): DataFrame = {
    val t = col(textCol)
    val toks = TextAnalysis.tokens(t)
    val nw = size(toks)
    val meanLen = round(
      when(nw === 0, 0.0).otherwise(
        aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") /
          nw.cast("double")), 6)
    val symbolRatio = round(
      when(nw === 0, 0.0).otherwise(
        (countOccurrences(t, "#") + countOccurrences(t, "...") +
          countOccurrences(t, "…")).cast("double") / nw.cast("double")), 6)
    val ls = lines(t)
    val nl = size(ls)
    def lineFrac(pred: Column => Column): Column = round(
      when(nl === 0, 0.0).otherwise(
        size(filter(ls, pred)).cast("double") / nl.cast("double")), 6)
    val bulletFrac = lineFrac(l =>
      l.startsWith("-") || l.startsWith("*") || l.startsWith("•"))
    val ellipsisFrac = lineFrac(l =>
      l.endsWith("...") || l.endsWith("…"))
    val alphaFrac = round(
      when(nw === 0, 0.0).otherwise(
        size(filter(toks, w => w.rlike("[a-z]"))).cast("double") /
          nw.cast("double")), 6)
    // Gopher's "must contain 2 of ..." stop-word presence check: a
    // fixed tiny list, counted by DISTINCT presence, not frequency
    val stopList = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHits = size(filter(
      typedLit(stopList), s => array_contains(toks, s)))
    docs.select(
      col(idCol),
      (nw >= minWords && nw <= maxWords).as("ok_word_count"),
      (meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen).as("ok_mean_word_len"),
      (symbolRatio <= maxSymbolRatio).as("ok_symbol_ratio"),
      (bulletFrac <= maxBulletFrac).as("ok_bullet_lines"),
      (ellipsisFrac <= maxEllipsisFrac).as("ok_ellipsis_lines"),
      (alphaFrac >= minAlphaFrac).as("ok_alpha_words"),
      (stopHits >= minStopwords).as("ok_stopwords"))
      .withColumn("keep",
        col("ok_word_count") && col("ok_mean_word_len") && col("ok_symbol_ratio") &&
          col("ok_bullet_lines") && col("ok_ellipsis_lines") &&
          col("ok_alpha_words") && col("ok_stopwords"))
  }

  /** One C4 §2.2 line-retention decision: terminal punctuation, a
    * minimum word count, and none of the drop markers. */
  private def c4LineKept(l: Column, minLineWords: Int): Column = {
    val endsOk = l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
      l.endsWith("\"") || l.endsWith("'")
    val words = size(filter(split(l, " "), w => length(w) > 0))
    val lo = lower(l)
    endsOk && words >= minLineWords &&
      !lo.contains("javascript") && !lo.contains("lorem ipsum") &&
      !l.contains("{")
  }

  /** C4 line cleaning: per document, the total and surviving line
    * counts plus the doc-level verdict (`n_kept >= minKeptLines` —
    * the paper's ≥-3-sentence form on line granularity). Use
    * [[c4CleanText]] for the surviving text itself. */
  def c4LineStats(docs: DataFrame, idCol: String, textCol: String,
                  minLineWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val ls = lines(col(textCol))
    docs.select(
      col(idCol),
      size(ls).cast("long").as("n_lines"),
      size(filter(ls, l => c4LineKept(l, minLineWords))).cast("long").as("n_kept"))
      .withColumn("keep", col("n_kept") >= minKeptLines)
  }

  /** The cleaned document text — C4's surviving lines re-joined in
    * order (documents failing the keep gate yield an empty string,
    * the drop marker the caller filters on). */
  def c4CleanText(docs: DataFrame, idCol: String, textCol: String,
                  minLineWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val kept = filter(lines(col(textCol)), l => c4LineKept(l, minLineWords))
    docs.select(col(idCol),
      when(size(kept) >= minKeptLines, array_join(kept, "\n"))
        .otherwise(lit("")).as("cleaned"))
  }
}
