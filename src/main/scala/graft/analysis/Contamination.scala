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

  /** One hash per n-token shingle: fold the n token hashes with the
    * same polynomial (token hashes < 2^30, so h·31 + x stays far from
    * Long overflow). Documents shorter than n yield their single
    * truncated shingle. */
  def shingleHashes(text: Column, n: Int): Column = {
    val th = tokenHashes(text)
    transform(
      sequence(lit(0), greatest(size(th) - n, lit(0))),
      i => aggregate(slice(th, i + 1, lit(n)), lit(7L),
        (h, x) => (h * 31 + x) % 1000000007L))
  }

  /** Training docs sharing at least one n-gram with the benchmark set:
    * distinct contaminated ids, one per row. */
  def contaminated(train: DataFrame, bench: DataFrame, textCol: String,
                   idCol: String, n: Int): DataFrame = {
    val trainGrams = train.select(col(idCol),
      explode(shingleHashes(col(textCol), n)).as("gram"))
    val benchGrams = bench
      .select(explode(shingleHashes(col(textCol), n)).as("gram")).distinct()
    trainGrams
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .select(col(idCol)).distinct()
  }
}
