package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Benchmark-contamination detection — the training-data hygiene pass
  * that flags training documents sharing an n-token shingle with an
  * evaluation/benchmark set (n-gram overlap is the standard published
  * decontamination criterion).
  *
  * Scale shape: both sides tokenize → hash each token with the portable
  * polynomial → fold each n-gram's token hashes into one 30-bit gram
  * key. Only (doc_id, gram-hash) longs shuffle — never text. The
  * benchmark side is small by nature (eval sets are thousands of
  * documents, not billions), so its distinct gram set BROADCASTS and
  * the check is a broadcast left_semi per training partition: no
  * all-pairs stage, no skew surface, linear in the training corpus.
  */
object Contamination {

  /** Per-token portable polynomial hashes (same family as
    * [[graft.text.TextAnalysis.fingerprint]]: fold (h·31+code) mod
    * 1e9+7, seed 7 — DuckDB reproduces with list_reduce over ord()). */
  def tokenHashes(text: Column): Column =
    transform(TextAnalysis.tokens(text), t =>
      aggregate(split(t, ""), lit(7L), (h, c) => (h * 31 + ascii(c)) % 1000000007L))

  /** One hash per n-token shingle, given an ALREADY-MATERIALIZED token
    * hash array column: fold the n token hashes with the same
    * polynomial (token hashes < 2^30, so h·31 + x stays far from Long
    * overflow). Documents shorter than n yield their single truncated
    * shingle.
    *
    * `th` must be a bound column, not the [[tokenHashes]] expression
    * inline: the lambda references it once per shingle index, and
    * Catalyst re-evaluates a referenced EXPRESSION per reference (the
    * known HOF recompute trap) — inlining turned the whole pass
    * O(shingles × tokens × chars) and measured 14 s at sf0.1 vs well
    * under 1 s materialized. */
  def shinglesOfHashes(th: Column, n: Int): Column =
    transform(
      sequence(lit(0), greatest(size(th) - n, lit(0))),
      i => aggregate(slice(th, i + 1, lit(n)), lit(7L),
        (h, x) => (h * 31 + x) % 1000000007L))

  /** Composed-builtin gram rows — the executable specification of the
    * fused path below (token-hash array materialized in its own
    * projection so each stage stays linear in tokens). */
  private[graft] def gramRowsComposed(df: DataFrame, textCol: String,
                                      cols: Seq[Column], n: Int): DataFrame =
    df.select(cols :+ tokenHashes(col(textCol)).as("__th"): _*)
      .select(cols :+ explode(shinglesOfHashes(col("__th"), n)).as("gram"): _*)

  /** Exploded (id, gram) rows via the fused single-pass expression
    * ([[graft.functions.TokenShingleHashes]] — one string walk, no
    * per-token split allocations, no interpreted lambda frames). */
  private def gramRows(df: DataFrame, textCol: String, cols: Seq[Column],
                       n: Int): DataFrame =
    df.select(cols :+ explode(
      graft.functions.TokenShingleHashes(col(textCol), n)).as("gram"): _*)

  /** Training docs sharing at least one n-gram with the benchmark set:
    * distinct contaminated ids, one per row. */
  def contaminated(train: DataFrame, bench: DataFrame, textCol: String,
                   idCol: String, n: Int): DataFrame = {
    val trainGrams = gramRows(train, textCol, Seq(col(idCol)), n)
    val benchGrams = gramRows(bench, textCol, Nil, n).distinct()
    trainGrams
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .select(col(idCol)).distinct()
  }
}
