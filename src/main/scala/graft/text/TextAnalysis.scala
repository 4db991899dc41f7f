package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data-pipeline extensions
  * (north star): token counting, quality scoring, language ID,
  * document fingerprinting. All pure Column builders over builtin
  * (codegen'd) functions — scalar maps, no shuffle, no UDFs.
  *
  * Oracle portability: the fingerprint uses the same engine-portable
  * polynomial hash as the featurizer (mod 1e9+7, base 31, seed 7), so
  * DuckDB reproduces it with `list_reduce` over `ord()` codes.
  */
object TextAnalysis {

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Mean token length, rounded 6. */
  def avgTokenLen(text: Column): Column = {
    val ts = tokens(text)
    round(
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        greatest(size(ts), lit(1)).cast("double"), 6)
  }

  /** Fraction of characters outside [a-z0-9 ] after lowercasing.
    * Raw (unrounded) — compose before rounding so composites never land
    * on an exact round-half boundary (a pre-rounded 6-decimal input
    * times 0.3 yields exact 7th-decimal halves that DuckDB and the JVM
    * round differently). */
  def punctRatioRaw(text: Column): Column =
    (length(lower(text)) - length(regexp_replace(lower(text), "[^a-z0-9 ]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def punctRatio(text: Column): Column = round(punctRatioRaw(text), 6)

  /** Per-language marker lists for the n-gram/stopword language-ID
    * heuristic. Deterministic, tiny, broadcast as literals. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "nicht", "mit"),
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "los", "que", "de", "y"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "zai"))

  /** # tokens that appear in `markers`. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit): _*)))

  /** Predicted language: argmax of marker hits, alphabetical tie-break
    * (deterministic total order over the 5-way score tuple). */
  def langId(text: Column): Column = {
    // greatest() over (hits, pri, lang) structs = argmax hits; `pri` is
    // the reverse-alphabetical index, so on tied hits the greatest pri —
    // i.e. the alphabetically-FIRST language — wins.
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(markerHits(text, ms).as("hits"),
        lit(LangMarkers.keys.toSeq.sorted.reverse.indexOf(lang)).as("pri"),
        lit(lang).as("lang"))
    }
    greatest(scored: _*).getField("lang")
  }

  /** Stopword ratio against the English marker list (quality signal). */
  def stopwordRatioRaw(text: Column): Column =
    markerHits(text, LangMarkers("en")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  def stopwordRatio(text: Column): Column = round(stopwordRatioRaw(text), 6)

  /** Composite quality score in [0,1]: length signal + punctuation
    * cleanliness + stopword naturalness. Fixed deterministic formula
    * over RAW ratios (see punctRatioRaw), rounded once. */
  def qualityScore(text: Column): Column =
    round(
      lit(0.4) * least(tokenCount(text).cast("double") / 50.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - punctRatioRaw(text)) +
        lit(0.3) * least(stopwordRatioRaw(text) * 5.0, lit(1.0)), 6)

  /** PII patterns — a regex subset that behaves identically under
    * Java's engine and RE2-style engines (no backrefs, no lookaround),
    * so the DuckDB oracle replays the same scrub. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{3,}"

  /** PII redaction — emails and phone numbers replaced with typed
    * placeholder tags, the standard pre-training privacy scrub. Pure
    * per-row regexp_replace: no shuffle, codegen'd, linear in corpus
    * bytes at any scale. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]")

  /** PII PSEUDONYMIZATION — the linkage-preserving alternative to
    * [[redactPii]]: each distinct email/phone maps to a STABLE tag
    * `[EMAIL_<h>]`/`[PHONE_<h>]` (h = the portable polynomial
    * fingerprint of the matched string mod 100000), so the same
    * identity carries the same tag across every document — joins,
    * dedup and frequency analysis survive the scrub, while the raw
    * identifier does not. (One-way, but NOT cryptographic: the tag
    * space is deliberately small; treat it as unlinkable only against
    * casual inspection — the k-anonymity audit composes for the rest.)
    *
    * Per-row, no shuffle: matches via `regexp_extract_all`, then a
    * replace-fold over the match list. A match that is a substring of
    * another match would corrupt the longer one if replaced first —
    * impossible for these anchored-charset patterns (neither can
    * properly contain another match of itself on this corpus's
    * space-separated text), documented rather than defended. */
  def pseudonymizePii(text: Column): Column = {
    def tag(prefix: String)(m: Column): Column =
      concat(lit("[" + prefix + "_"),
        (fingerprint(m) % 100000L).cast("string"), lit("]"))
    val e = aggregate(regexp_extract_all(text, lit(EmailRe), lit(0)), text,
      (acc, m) => replace(acc, m, tag("EMAIL")(m)))
    aggregate(regexp_extract_all(text, lit(PhoneRe), lit(0)), e,
      (acc, m) => replace(acc, m, tag("PHONE")(m)))
  }

  /** Text normalization scrub (standard ingest preprocessing): ASCII
    * control characters → space, space runs collapsed, ends trimmed.
    * The run-collapse pattern is a literal `" +"` ON PURPOSE: `\s` class
    * membership differs between Java regex and RE2 (\x0B), but after
    * step one only real spaces remain, so the literal is
    * engine-portable. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x1F\\x7F]", " "), " +", " "))

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1, public):
    * heavily repetitious text is a strong low-quality indicator for
    * pre-training corpora.
    *
    *   - `dup_word_frac` — fraction of words that repeat an earlier
    *     word: (n_words − n_distinct_words) / n_words. Pure per-row
    *     array math, no shuffle.
    *   - `top2_frac`    — fraction of characters covered by the most
    *     frequent word bigram: count × len(bigram) / len(text). The
    *     bigram mode is computed DISTRIBUTED — explode to (doc, gram)
    *     rows, count, argmax — because per-row mode via array HOFs is
    *     O(words × distinct_grams) per document, quadratic on long
    *     documents; the exploded form shuffles fixed-width (id, gram
    *     hash) rows and stays linear at any document length.
    *
    * Tie-break: greatest count, then lexicographically SMALLEST gram
    * (`min(struct(-count, gram))` — a string cannot be negated, so the
    * count is). Words split on single spaces, exactly `string_split`
    * in the DuckDB oracle. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = split(col(textCol), " ")
    val nBigrams = greatest(size(ws) - 1, lit(0))
    val base = docs.select(col(idCol).as("doc_id"),
      length(col(textCol)).as("nc"),
      size(ws).as("nw"),
      size(array_distinct(ws)).as("ndw"),
      zip_with(slice(ws, lit(1), nBigrams), slice(ws, lit(2), nBigrams),
        (a, b) => concat_ws(" ", a, b)).as("bigrams"))
    val top = base.select(col("doc_id"), explode(col("bigrams")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("c")).as("negc"), col("g").as("g"))).as("m"))
      .select(col("doc_id"), (-col("m.negc")).as("c"), col("m.g").as("g"))
    base.join(top, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        round((col("nw") - col("ndw")).cast("double") /
          greatest(col("nw"), lit(1)).cast("double"), 6).as("dup_word_frac"),
        round(coalesce(col("c") * length(col("g")), lit(0L)).cast("double") /
          greatest(col("nc"), lit(1)).cast("double"), 6).as("top2_frac"))
  }

  /** Rolling polynomial fingerprint over the full text: fold
    * (h*31 + charCode) mod 1e9+7, seed 7 — same hash family as
    * [[graft.embed.Featurizer]]; one HOF pass per row. */
  /** Vocabulary coverage — the tokenizer-fit gate: what fraction of
    * each group's token OCCURRENCES the global top-`vocabSize`
    * vocabulary covers. The multilingual reality this surfaces: a
    * frequency-built vocabulary is dominated by the majority language,
    * and minority languages pay the OOV (or, for subword tokenizers,
    * the fertility) cost — low coverage for a group says the
    * vocabulary, or the mix it was built from, needs rebalancing
    * ([[graft.analysis.Sampling.temperatureMix]] is the lever).
    *
    * Scale shape: one term-keyed count reduce, a TakeOrdered top-V
    * (never a global sort), the V-row vocabulary broadcast back as a
    * membership join, and one group-keyed conditional count. */
  def vocabCoverage(docs: DataFrame, textCol: String, groupCol: String,
                    vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize >= 1: $vocabSize")
    val tok = docs.select(col(groupCol).as("__g"),
      explode(tokens(col(textCol))).as("term"))
    val vocab = tok.groupBy(col("term")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("term").asc)
      .limit(vocabSize)
      .select(col("term"), lit(1L).as("__iv"))
    tok.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__iv").isNotNull, lit(1))).as("in_vocab"))
      .withColumn("coverage",
        round(col("in_vocab").cast("double") / col("n_tokens"), 6))
  }

  /** Term-association mining — document-level pointwise mutual
    * information over the frequent vocabulary: which term pairs
    * co-occur in documents far more than their independent rates
    * predict (collocations, topic anchors, template signatures).
    * `PMI(a,b) = ln(n_ab · N / (n_a · n_b))` over document PRESENCE
    * counts (a term counts once per doc), with a `minDf` vocabulary
    * cut and a `minPair` co-occurrence floor (PMI is noise-dominated
    * at tiny counts — the standard guards). Top-`topK` pairs by
    * `(pmi DESC, term_a, term_b)`, pmi round-6.
    *
    * Scale shape: the pair generation is the quadratic step, so it
    * runs AFTER the df cut — per-doc fan-out is C(kept terms in doc,
    * 2), bounded by the vocabulary cut, not the document length (the
    * PPJoin prefix-filter lesson applied to co-occurrence). One
    * doc-keyed self-join on the filtered presence table, counts
    * map-side combined, N a 1-row broadcast. Raise `minDf` to shrink
    * the candidate vocabulary first at scale. */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
               minDf: Long, minPair: Long, topK: Int): DataFrame = {
    require(minDf >= 1 && minPair >= 1 && topK >= 1, "positive guards required")
    val pres = docs
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("term"))
      .distinct()
    val dfc = pres.groupBy(col("term")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
    val kept = pres.join(dfc, Seq("term"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val pairs = kept.select(col("__id"), col("term").as("term_a"), col("__df").as("__dfa"))
      .join(kept.select(col("__id"), col("term").as("term_b"), col("__df").as("__dfb")),
        Seq("__id"))
      .filter(col("term_a") < col("term_b"))
      .groupBy(col("term_a"), col("term_b"))
      .agg(count(lit(1)).as("n_ab"),
        first(col("__dfa")).as("__dfa"), first(col("__dfb")).as("__dfb"))
      .filter(col("n_ab") >= minPair)
    pairs.crossJoin(broadcast(n))
      .select(col("term_a"), col("term_b"), col("n_ab"),
        round(log(col("n_ab") * col("__n") /
          (col("__dfa") * col("__dfb")).cast("double")), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("term_a").asc, col("term_b").asc)
      .limit(topK)
  }

  def fingerprint(text: Column): Column =
    aggregate(split(text, ""), lit(7L),
      (h, c) => (h * 31 + ascii(c)) % 1000000007L)
}
