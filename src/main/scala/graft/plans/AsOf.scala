package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark has no builtin for:
  * every left row matches the single most recent right row with
  * `right.ts <= left.ts` in the same key partition (the time-series /
  * feature-lookup join; DuckDB and kdb ship it natively as ASOF JOIN).
  *
  * The naive formulation — a range join `l.ts >= r.ts` + window top-1 —
  * explodes to O(|L|·|R|) pairs per key before pruning, the classic
  * range-join fan-out. This is instead the union-and-carry pattern: tag
  * both inputs, sort each key's timeline ONCE (one keyed shuffle —
  * Spark's window sort), and carry the latest right payload forward
  * with `last(_, ignoreNulls = true)` over an unbounded-preceding
  * frame; left rows then read their match from the carried column. At
  * equal timestamps the right row sorts first, so the match is
  * inclusive (`>=`), same as DuckDB's ASOF. Cost is one sort-merge
  * pass over |L|+|R| rows per key — no fan-out at any scale.
  */
object AsOf {

  /** Left rows of `left` with `payload` columns of their as-of match
    * from `right` (null when no right row precedes). `right` should be
    * deterministic per (key, ts) — pre-aggregate duplicates upstream. */
  def asOfJoin(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String,
               payload: Seq[String]): DataFrame = {
    val l = left.withColumn("__is_r", lit(0))
    val r = right.select(
      (col(keyCol) +: col(tsCol) +: payload.map(c => col(c).as(s"__rv_$c"))): _*)
      .withColumn("__is_r", lit(1))
    val timeline = l.unionByName(r, allowMissingColumns = true)
    val carry = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(timeline) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__rv_$c"), ignoreNulls = true).over(carry))
    }
    carried.filter(col("__is_r") === 0)
      .drop("__is_r" +: payload.map(c => s"__rv_$c"): _*)
  }
}
