package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TokenShingleHashes

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * the MOSS local fingerprinting algorithm).
  *
  * MinHash (`analysis.Dedup`) estimates WHOLE-document resemblance; it
  * can miss a long verbatim passage pasted into an otherwise-different
  * document. Winnowing is the complementary LOCAL guarantee: from the
  * positional k-token shingle hash stream, every window of `w`
  * consecutive shingles contributes its minimum hash, so **any shared
  * token run of length ≥ w + k − 1 is certain to share at least one
  * selected fingerprint** (the paper's correctness property), while the
  * expected density of selected fingerprints is 2/(w+1) of all
  * shingles — a tunable sketch size with a detection floor, which
  * MinHash does not offer.
  *
  * Determinism: shingle hashes are the portable polynomial
  * ([[graft.functions.TokenShingleHashes]], replayed verbatim in the
  * DuckDB oracles), window minima are integer comparisons, and the
  * output is the DISTINCT selected-hash set — so the whole fingerprint
  * computation reproduces bit-for-bit cross-engine. (Positions are not
  * recorded: overlap DETECTION needs only the set; the paper's
  * positional variant is for locating matches.)
  *
  * Scale shape: [[fingerprints]] is a per-row column expression — one
  * string walk + an O(n·w) integer loop per document, no shuffle.
  * [[overlapPairs]] shuffles (doc, fingerprint) longs keyed by
  * fingerprint; hot fingerprints (boilerplate shared by more than
  * `maxDf` docs) are dropped BEFORE the pair join — the PPJoin
  * prefix-filter lesson — so per-key fan-out is C(maxDf, 2)-bounded
  * and there is never an all-pairs step.
  */
object Winnow {

  /** The distinct winnowing fingerprint set of `text` as an
    * `array<long>` column: k-token shingle hashes, window-w minima.
    * A document with fewer than w shingles yields its global minimum
    * (one fingerprint — the algorithm's natural short-input
    * degeneration); an empty token list yields the seed hash. */
  def fingerprints(text: Column, k: Int, w: Int): Column = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    val hs = TokenShingleHashes(text, k)
    array_distinct(
      transform(sequence(lit(0), greatest(size(hs) - w, lit(0))),
        i => array_min(slice(hs, i + 1, lit(w)))))
  }

  /** Documents sharing ≥ `minShared` winnowing fingerprints — the MOSS
    * overlap report. Fingerprints present in more than `maxDf`
    * documents are corpus boilerplate and are excluded from pairing
    * (df-filter before the join; bounds fan-out AND stops stop-phrase
    * fingerprints from linking everything to everything).
    *
    * @return `(doc_a, doc_b, n_shared)`, doc_a < doc_b
    */
  def overlapPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, w: Int, maxDf: Int, minShared: Int): DataFrame =
    sharedCounts(keptFps(docs, idCol, textCol, k, w, maxDf))
      .filter(col("n_shared") >= minShared)

  /** ASYMMETRIC containment report — "document A lives inside document
    * B": shared fingerprints over the SMALLER document's fingerprint
    * count (Broder's containment coefficient on the winnowing sketch).
    * Jaccard-style overlap dilutes when a short document is pasted
    * into a long one; containment does not — the quote/boilerplate/
    * excerpt detector. Counts are over the df-filtered fingerprint
    * sets (the same boilerplate exclusion as [[overlapPairs]]).
    *
    * @return `(doc_a, doc_b, n_shared, containment)` round-6,
    *         containment ≥ `minContain`
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       k: Int, w: Int, maxDf: Int,
                       minContain: Double): DataFrame = {
    val kept = keptFps(docs, idCol, textCol, k, w, maxDf)
    val counts = kept.groupBy(col("__id")).agg(count(lit(1)).as("__nfp"))
    sharedCounts(kept)
      .join(counts.select(col("__id").as("doc_a"), col("__nfp").as("__na")), "doc_a")
      .join(counts.select(col("__id").as("doc_b"), col("__nfp").as("__nb")), "doc_b")
      .withColumn("containment",
        round(col("n_shared").cast("double") /
          least(col("__na"), col("__nb")).cast("double"), 6))
      .filter(col("containment") >= minContain)
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("containment"))
  }

  /** Per-doc distinct fingerprints with corpus-boilerplate
    * (df > maxDf) fingerprints removed.
    *
    * The fingerprint pass is MATERIALIZED ONCE (localCheckpoint) and
    * so is the df-filtered result: without it, the df-count branch
    * and both sides of [[sharedCounts]]' self-join (plus
    * [[containmentPairs]]' per-doc counts) each re-derive the explode
    * from the raw text — O(n·w) token walks per document repeated up
    * to six times per query plan. Checkpointing trades one
    * executor-storage write of (doc, fp) longs for five corpus
    * re-scans — the [[graft.analysis.Dedup.deltaDupPairs]]
    * precedent. */
  private def keptFps(docs: DataFrame, idCol: String, textCol: String,
                      k: Int, w: Int, maxDf: Int): DataFrame = {
    val fps = docs.select(col(idCol).as("__id"),
        explode(fingerprints(col(textCol), k, w)).as("fp"))
      .distinct()
      .localCheckpoint(true)
    val rare = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select("fp")
    fps.join(rare, "fp").localCheckpoint(true)
  }

  private def sharedCounts(kept: DataFrame): DataFrame =
    kept.select(col("fp"), col("__id").as("doc_a"))
      .join(kept.select(col("fp"), col("__id").as("doc_b")), "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
}
