package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-window character chunker + chunk-level operators.
  *
  * Reference semantics (`/root/reference/App.tsx:56-61`, constants
  * `constants.ts:9-10`): fixed-size character windows
  * `for (i = 0; i < len; i += size - overlap) substring(i, i + size)` —
  * last chunk may be short; whitespace-only chunks dropped; dense
  * 0-based ordinal ids in chunk order (`App.tsx:72-76`).
  *
  * Spark-first: offsets via `sequence` + `explode` + `substring` — pure
  * builtin, whole-stage-codegen'd, no custom Generator needed. The
  * explode multiplies rows inside a partition with no shuffle, so the
  * chunker scales linearly with input splits.
  */
object Chunker {

  /** Explode `textCol` into (pos, chunk) rows. `pos` is the 0-based char
    * offset (the loop variable of `App.tsx:57`). Keeps all other columns. */
  def chunk(df: DataFrame, textCol: String, size: Int, overlap: Int): DataFrame = {
    require(overlap >= 0, s"overlap $overlap must be >= 0")
    require(overlap < size, s"overlap $overlap must be < size $size")
    val stride = size - overlap
    // offsets 0, stride, 2·stride, … < len. Empty text yields ZERO
    // chunks, exactly like the reference loop (`App.tsx:57` runs 0
    // times): the `when` leaves the offsets null for len = 0 and the
    // non-outer explode drops the row.
    df.withColumn("pos",
        explode(when(length(col(textCol)) > 0,
          sequence(lit(0), length(col(textCol)) - 1, lit(stride)))))
      .withColumn("chunk", substring(col(textCol), col("pos") + lit(1), lit(size)))
  }

  /** A3 — drop whitespace-only chunks (`App.tsx:61`). */
  def nonEmpty(chunkCol: Column): Column = length(trim(chunkCol)) > 0

  /** TOKEN-window chunker — the unit-upgraded form of [[chunk]]
    * (`App.tsx:56-59` slides over characters; an embedding/LLM
    * pipeline budgets in tokens): sliding windows of `size` tokens
    * with `overlap`-token overlap over the normalized token stream
    * ([[TextAnalysis.tokens]] — the project's one tokenizer), chunk
    * text re-joined with single spaces. Same loop semantics as the
    * char form: start offsets 0, stride, … < n_tokens, final window
    * may be short, token-less documents yield zero rows. One row per
    * `(id, chunk_idx)` with the window's token count. Pure per-row
    * explode — embarrassingly parallel, fan-out n_tokens/stride. */
  def tokenChunk(df: DataFrame, idCol: String, textCol: String,
                 size: Int, overlap: Int): DataFrame = {
    require(overlap >= 0, s"overlap $overlap must be >= 0")
    require(overlap < size, s"overlap $overlap must be < size $size")
    val stride = size - overlap
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__ts"))
      .withColumn("__start",
        explode(when(org.apache.spark.sql.functions.size(col("__ts")) > 0,
          sequence(lit(0),
            org.apache.spark.sql.functions.size(col("__ts")) - 1,
            lit(stride)))))
      .select(col(idCol), (col("__start") / stride).cast("long").as("chunk_idx"),
        slice(col("__ts"), col("__start") + lit(1), lit(size)).as("__w"))
      .select(col(idCol), col("chunk_idx"),
        org.apache.spark.sql.functions.size(col("__w")).cast("long")
          .as("n_tokens"),
        array_join(col("__w"), " ").as("chunk"))
  }

  /** Inverse of [[chunk]] — rebuild each document from its overlapping
    * (pos, chunk) rows: the chunk at pos 0 contributes whole, every
    * later chunk drops its first `overlap` chars (those chars are the
    * tail of the previous window — chunk at pos p covers [p, p+size)
    * and the previous covered through p+overlap). A short final chunk
    * of length ≤ overlap contributes '' and is already fully covered.
    * The round trip is EXACT for any text — that is the contract the
    * `doc_reassembly` query and spec pin.
    *
    * Why it exists: chunk-level pipelines (embed, dedup, quality-filter
    * at chunk granularity) need to reconstitute documents afterwards —
    * e.g. re-assembling a cleaned corpus where whole chunks were
    * dropped or rewritten. Scale shape: one doc-keyed aggregate; the
    * per-group sorted-struct fold holds one document's text, the same
    * bounded-state contract as the packed-window materializer. Order
    * is carried INSIDE `array_sort` over (pos, piece) structs — no
    * window sort, no collect_list ordering assumption. */
  def reassemble(chunks: DataFrame, docIdCol: String, overlap: Int): DataFrame =
    chunks
      .withColumn("__piece",
        when(col("pos") === 0, col("chunk"))
          .otherwise(col("chunk").substr(lit(overlap + 1), length(col("chunk")))))
      .groupBy(col(docIdCol))
      .agg(count(lit(1)).as("n_chunks"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("__piece")))),
            x => x("__piece")), "").as("text"))

  /** A7 — dense 0-based ordinal chunk ids in (docIdCol, pos) order.
    *
    * Fully distributed two-level prefix sum — NO single-partition stage
    * anywhere, at either chunk or document granularity:
    *  1. count chunks per document (distributed agg);
    *  2. range-partition the per-doc table by doc id (partition p holds a
    *     contiguous, ordered id range), stamp the physical partition id,
    *     run the running sum as a window per partition id, and PERSIST
    *     the result. The persist is a CORRECTNESS pin, not a perf cache:
    *     `spark_partition_id()` over a sampled range exchange is
    *     nondeterministic across executions (RangePartitioner re-samples
    *     boundaries), and the stamped table feeds TWO branches below —
    *     without the pin their consistency silently depends on physical
    *     exchange reuse (an optimization, not a guarantee; AQE plan
    *     divergence or `spark.sql.exchange.reuse=false` breaks it and
    *     yields wrong ids with no error). The cache holds one skinny
    *     (id, count, pid, run) row per doc — GBs at 100 TB corpus scale —
    *     and recompute-on-block-loss replays the SAME shuffle dependency
    *     (same sampled boundaries), so the pin holds even under executor
    *     loss. Auto-unpersisted by the ContextCleaner when unreferenced.
    *  3. partition subtotals (one row per partition — a few hundred rows
    *     at any scale) turn into exclusive partition offsets via a
    *     broadcast non-equi self-join, not a global window;
    *  4. base(doc) = partition offset + local running sum − own count,
    *     joined back to the chunk rows (Catalyst broadcasts when small;
    *     at billions of docs it degrades to a shuffle join on doc id,
    *     which the intra-doc rank window below reuses).
    * Matches the dense-id semantics of `App.tsx:72-76` without
    * `monotonically_increasing_id` (non-dense, partition-dependent).
    */
  def withOrdinalIds(chunks: DataFrame, docIdCol: String): DataFrame = {
    val p = chunks.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val perDoc = chunks.groupBy(col(docIdCol)).agg(count(lit(1)).as("__n"))
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col(docIdCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // explicit partition count: a bare repartitionByRange(col) is
    // AQE-coalescible, and this exchange exists to spread the window
    val local = perDoc.repartitionByRange(p, col(docIdCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__run", sum(col("__n")).over(wLocal))
      .persist()
    val sub = local.groupBy(col("__pid")).agg(sum(col("__n")).as("__pn"))
    val offsets = sub.as("a")
      .join(broadcast(sub.as("b")), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__pn")), lit(0L)).as("__poff"))
    val bases = local.join(broadcast(offsets), Seq("__pid"))
      .select(col(docIdCol), (col("__poff") + col("__run") - col("__n")).as("__base"))
    // intra-doc rank among *surviving* chunks (ids are assigned after the
    // non-empty filter in the reference, App.tsx:61→72-76) — a window
    // partitioned by document, which shuffles by doc id and stays fully
    // distributed (per-doc chunk counts are small).
    val wIntra = Window.partitionBy(col(docIdCol)).orderBy(col("pos"))
    chunks
      .join(bases, docIdCol)
      .withColumn("chunk_id", col("__base") + row_number().over(wIntra) - 1)
      .drop("__base")
  }
}
