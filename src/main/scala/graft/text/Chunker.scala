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
    require(overlap < size, s"overlap $overlap must be < size $size")
    val stride = size - overlap
    // offsets 0, stride, 2·stride, … < max(len, 1): empty text still
    // yields one (empty) chunk, exactly like the JS loop runs 0 times →
    // [] but substring("",1,n)="" after the 1-iteration guard; we emit
    // one empty chunk which the non-empty filter (A3) then drops.
    df.withColumn("pos",
        explode(sequence(lit(0), greatest(length(col(textCol)) - 1, lit(0)), lit(stride))))
      .withColumn("chunk", substring(col(textCol), col("pos") + lit(1), lit(size)))
  }

  /** A3 — drop whitespace-only chunks (`App.tsx:61`). */
  def nonEmpty(chunkCol: Column): Column = length(trim(chunkCol)) > 0

  /** A7 — dense 0-based ordinal chunk ids in (docIdCol, pos) order.
    *
    * Scale-first two-phase design instead of one global window over all
    * chunk rows: (1) count chunks per document (distributed agg);
    * (2) exclusive prefix-sum over the *document-level* table (tiny — one
    * row per doc) to get each doc's base offset; (3) broadcast the bases
    * back and add the intra-document rank `pos / stride`. The only
    * single-partition step touches #docs rows, not #chunks rows — at
    * 100 TB the chunk table never passes through one node, matching the
    * dense-id semantics of `App.tsx:72-76` without
    * `monotonically_increasing_id` (non-dense, partition-dependent).
    */
  def withOrdinalIds(chunks: DataFrame, docIdCol: String): DataFrame = {
    val perDoc = chunks.groupBy(col(docIdCol)).agg(count(lit(1)).as("__n"))
    val wDoc = Window.orderBy(col(docIdCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = perDoc
      .withColumn("__base", sum(col("__n")).over(wDoc) - col("__n"))
      .select(col(docIdCol), col("__base"))
    // intra-doc rank among *surviving* chunks (ids are assigned after the
    // non-empty filter in the reference, App.tsx:61→72-76) — a window
    // partitioned by document, which shuffles by doc id and stays fully
    // distributed (per-doc chunk counts are small).
    val wIntra = Window.partitionBy(col(docIdCol)).orderBy(col("pos"))
    chunks
      .join(broadcast(bases), docIdCol)
      .withColumn("chunk_id", col("__base") + row_number().over(wIntra) - 1)
      .drop("__base")
  }
}
