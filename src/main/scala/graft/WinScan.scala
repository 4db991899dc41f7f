package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical

/** Diagnostic sweep: flags every query whose optimized plan contains a
  * window (or window-group-limit) with an EMPTY partition spec — the
  * single-partition global-sort shape that serializes at scale. Walks
  * the optimized LOGICAL plan (the physical tree hides inside
  * `AdaptiveSparkPlanExec` until execution, and rendered-string
  * regexes can't tell a partitioned `WindowGroupLimit [part], [ord]`
  * from an unpartitioned `Window [funcs], [ord]`).
  *
  * Queries here are ALLOWLISTED: their unpartitioned window runs over
  * a provably bounded row count (stated per entry), so the
  * single-partition sort is O(bound), not O(corpus) — the sweep
  * reports them as `ALLOWED` and a zero-hit sweep means "no
  * UNBOUNDED unpartitioned window", by policy. */
object WinScan {

  /** query name → why its unpartitioned window is bounded. */
  val allowlist: Map[String, String] = Map(
    "hybrid_rrf_top5" ->
      ("rrfFuse ranks two inputs ALREADY limited to their top-20 " +
        "(bm25TopK limit + knn TakeOrderedAndProject), so the " +
        "row_number windows sort <= 20 rows and the fused full-outer " +
        "frame <= 40 - bounded by the fusion depth, never the corpus"),
    "ks_value_drift" ->
      ("the cumulative window runs over BUCKET rows - O(range/width) " +
        "regardless of row count (the histogramQuantiles contract), " +
        "never data rows"),
    "activity_gini" ->
      ("the rank window runs over one row per KEY - bounded by key " +
        "cardinality (users/sources), never event rows"),
    "survival_curve" ->
      ("the at-risk cumulative window runs over duration-bucket GRID " +
        "rows - O(span/bucketSeconds) regardless of corpus size (the " +
        "ks_value_drift class), never entrant rows"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val plan = fn(spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
        val hits = plan.collect {
          case w: logical.Window if w.partitionSpec.isEmpty =>
            s"Window(order=${w.orderSpec.map(_.sql).mkString(",").take(60)})"
          case w: logical.WindowGroupLimit if w.partitionSpec.isEmpty =>
            s"WindowGroupLimit(order=${w.orderSpec.map(_.sql).mkString(",").take(60)})"
        }
        if (hits.nonEmpty) {
          if (allowlist.contains(n))
            println(s"ALLOWED: $n (${allowlist(n)})")
          else println(s"UNPARTITIONED: $n ${hits.mkString(" | ")}")
        }
      } catch { case e: Throwable => println(s"ERR $n: ${String.valueOf(e.getMessage).take(100)}") }
    }
    spark.stop()
  }
}
