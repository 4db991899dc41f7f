package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — pairs (l, r) on the same key with
  * `r.ts ∈ [l.ts + lower, l.ts + upper]`, inclusive.
  *
  * Spark plans a bare range predicate as a broadcast-nested-loop or
  * cartesian join — O(|L|·|R|) comparisons per key. The scale shape is
  * bucketization: bin both sides by the WINDOW SPAN (`upper − lower`),
  * so every left window covers at most two bins; the left side emits
  * its (at most 2) candidate bins, the join is a plain equi-join on
  * (key, bin), and the exact range predicate filters the survivors.
  * Join fan-out is bounded by real matches plus same-bin near-misses —
  * never all-pairs — and the equi-join shuffles fixed-width keys.
  *
  * Both inputs must already use distinct column names (rename before
  * joining, as with any self-join). Timestamps compare at microsecond
  * precision (`unix_micros`). */
object RangeJoin {

  def intervalJoin(left: DataFrame, right: DataFrame,
                   keyCol: String, leftTsCol: String, rightTsCol: String,
                   lowerSec: Long, upperSec: Long): DataFrame = {
    require(upperSec > lowerSec, s"empty interval: [$lowerSec, $upperSec]")
    val w = (upperSec - lowerSec) * 1000000L
    val lo = lowerSec * 1000000L
    val hi = upperSec * 1000000L
    val l = left
      .withColumn("__lt", unix_micros(col(leftTsCol)))
      .withColumn("__bin", explode(array_distinct(array(
        floor((col("__lt") + lo) / w), floor((col("__lt") + hi) / w)))))
    val r = right
      .withColumn("__rt", unix_micros(col(rightTsCol)))
      .withColumn("__bin", floor(col("__rt") / w))
    l.join(r, Seq(keyCol, "__bin"))
      .filter(col("__rt") >= col("__lt") + lo && col("__rt") <= col("__lt") + hi)
      .drop("__bin", "__lt", "__rt")
  }
}
