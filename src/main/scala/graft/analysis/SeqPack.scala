package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assign documents to fixed-token-capacity training
  * windows (the batch-construction step of an LLM data pipeline:
  * concatenate docs in a deterministic order, cut every `capacity`
  * tokens).
  *
  * This is CONTIGUOUS packing: docs keep id order and a doc belongs to
  * the window where its first token lands (`floor(exclusive-prefix-sum /
  * capacity)`), so windows overshoot capacity by at most one doc's tail.
  * That is the determinism-preserving, shuffle-light packing large
  * pipelines use; exact first-fit bin packing destroys ordering and
  * needs a serialized pass.
  *
  * Scale shape (same as Chunker.withOrdinalIds): a GLOBAL prefix sum
  * with no SinglePartition stage —
  *  1. range-repartition by id (the sort Spark would need anyway);
  *  2. per-partition running sums via a partition-local window;
  *  3. per-partition subtotals (one row per partition) → exclusive
  *     partition offsets via a broadcast non-equi self-join;
  *  4. window_id = (offset + local running sum − own weight) div capacity.
  */
object SeqPack {

  def packWindows(df: DataFrame, idCol: String, weightCol: String,
                  capacity: Long): DataFrame = {
    require(capacity >= 1, "capacity >= 1")
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.select(col(idCol), col(weightCol).cast("long").as("weight"))
      .repartitionByRange(p, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__run", sum(col("weight")).over(wLocal))
      .persist()
    val sub = local.groupBy(col("__pid")).agg(sum(col("weight")).as("__pn"))
    val offsets = sub.as("a")
      .join(broadcast(sub.as("b")), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__pn")), lit(0L)).as("__poff"))
    local.join(broadcast(offsets), Seq("__pid"))
      // integral div (NOT double division: exact past 2^53 token corpora)
      .select(col(idCol), col("weight"),
        expr(s"(__poff + __run - weight) div ${capacity}L").as("window_id"))
  }

  /** Packing-efficiency report over [[packWindows]] — the padding-
    * waste metric a training pipeline budgets by: per-window fills
    * reduced to one row `(n_windows, total_weight, min_fill,
    * max_fill, utilization)` with utilization =
    * total/(windows·capacity) round-6. Contiguous packing overshoots
    * by at most one document tail per window (so `max_fill` can
    * exceed `capacity`) and only the LAST window under-fills
    * structurally — a utilization far below 1 means oversized
    * documents, not packing slack. Integer sums throughout; one
    * division at the end. */
  def packEfficiency(df: DataFrame, idCol: String, weightCol: String,
                     capacity: Long): DataFrame = {
    val fills = packWindows(df, idCol, weightCol, capacity)
      .groupBy(col("window_id")).agg(sum(col("weight")).as("fill"))
    fills.agg(
      count(lit(1)).as("n_windows"),
      sum(col("fill")).as("total_weight"),
      min(col("fill")).as("min_fill"),
      max(col("fill")).as("max_fill"),
      round(sum(col("fill")).cast("double") /
        (count(lit(1)) * lit(capacity)).cast("double"), 6).as("utilization"))
  }
}
