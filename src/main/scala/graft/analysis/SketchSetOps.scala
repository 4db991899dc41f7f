package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch
import graft.vector.VectorOps

/** Set operations ON SKETCHES — distinct-union / distinct-intersection
  * / Jaccard estimates between two corpus slices from their KMV
  * summaries, without ever shuffling the slices against each other.
  *
  * The question "how much does re-crawl B overlap corpus A" is a
  * distinct-set question: exact answers need a full-width
  * distinct + join of both sides (two corpus-wide shuffles). KMV
  * sketches compose instead (Beyer et al., SIGMOD 2007 — public):
  * the bottom-k of A ∪ B is computable from the bottom-k of A and the
  * bottom-k of B alone (`K(A∪B) = bottom-k(K(A) ∪ K(B))`), so the
  * union estimate reuses the plain KMV estimator on the merged
  * sketch, and the intersection follows from the Jaccard estimator
  * ρ = |K(A∪B) ∩ K(A) ∩ K(B)| / |K(A∪B)|, D̂(A∩B) = ρ · D̂(A∪B).
  *
  * Determinism inherits from [[KmvSketch]]: the hash is the engine's
  * portable polynomial, "k smallest distinct" is a set property
  * invariant to row/merge order, and the estimator arithmetic is a
  * fixed IEEE op sequence — the ESTIMATES replay bit-for-bit in SQL.
  * When the merged sketch holds fewer than k hashes it holds EVERY
  * hash of A ∪ B, and all three outputs are exact (modulo hash
  * collisions), the same degradation-to-exact the plain sketch has.
  *
  * Scale shape: one map-side-combined aggregate over the two slices
  * (O(k) state per slice); the sketches — 2·k longs — are bounded
  * driver model state (the centroid-collect precedent), where the
  * estimator folds once. Nothing joins, nothing re-shuffles.
  */
object SketchSetOps {

  /** Union / intersection / Jaccard estimates between slices `a` and
    * `b` of `df` (slices = values of `sliceCol`), from k-minimum-value
    * sketches of `keyCol`. One row:
    * `(union_est, intersect_est, jaccard)`, round-6. */
  def kmvSetOps(df: DataFrame, keyCol: String, sliceCol: String,
                a: String, b: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sketches = df.filter(col(sliceCol).isin(a, b))
      .groupBy(col(sliceCol))
      .agg(KmvSketch.sketchSet(col(keyCol), k).as("__sk"))
      .collect()
      .map(r => r.get(0).toString -> r.getSeq[Long](1).toVector)
      .toMap
    val ka = sketches.getOrElse(a, Vector.empty)
    val kb = sketches.getOrElse(b, Vector.empty)
    // bottom-k of the union, from the two bottom-k sets alone
    val ku = (ka ++ kb).distinct.sorted.take(k)
    val unionEst =
      if (ku.isEmpty) 0.0
      else if (ku.size < k) ku.size.toDouble
      else (k - 1).toDouble * KmvSketch.P / ku.last.toDouble
    val inA = ka.toSet
    val inB = kb.toSet
    val both = ku.count(h => inA(h) && inB(h))
    val jaccard = if (ku.isEmpty) 0.0 else both.toDouble / ku.size
    val interEst = jaccard * unionEst
    def r6(x: Double): Double = VectorOps.round6(x)
    Seq((r6(unionEst), r6(interEst), r6(jaccard)))
      .toDF("union_est", "intersect_est", "jaccard")
  }
}
