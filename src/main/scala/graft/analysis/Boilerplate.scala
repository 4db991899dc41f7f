package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Cross-corpus boilerplate removal — the CCNet/Gopher pipeline step
  * the per-document signals can't express: text SEGMENTS recurring
  * across many documents (headers, footers, navigation chrome, license
  * blocks) are dropped from every document, keeping the rest in order.
  * Per-doc dedup can't catch these (each document contains the segment
  * once); corpus-level near-dup can't either (the documents differ).
  *
  * Segmentation here is fixed `segTokens`-token windows of the
  * normalized token stream (a real web corpus would segment on lines
  * or sentences — the downstream shape is identical, only
  * [[tokenSegments]] changes). The output is therefore the CLEANED
  * TOKEN STREAM, not the raw text — the form a training pipeline
  * consumes anyway.
  *
  * Scale shape: segments shuffle by their 64-bit portable fingerprint
  * for the document-frequency count (16-byte keys, map-side combined);
  * the hot set filters by a keyed anti-join (no broadcast assumption —
  * at 100 TB the boilerplate vocabulary is itself large); reassembly
  * groups by doc id, with per-doc state bounded by the document's own
  * segment count. No driver collect anywhere.
  */
object Boilerplate {

  /** Consecutive non-overlapping `segTokens`-token segments of the
    * normalized token stream: `(id, seg_idx, seg)`; the final segment
    * may be shorter. Token-less documents yield no rows. */
  def tokenSegments(df: DataFrame, idCol: String, textCol: String,
                    segTokens: Int): DataFrame = {
    require(segTokens >= 1, s"segTokens >= 1: $segTokens")
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__ts"))
      .select(col(idCol), posexplode(
        when(size(col("__ts")) === 0, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0),
              ((size(col("__ts")) + lit(segTokens - 1)) / lit(segTokens))
                .cast("int") - 1),
            g => array_join(slice(col("__ts"), g * segTokens + lit(1),
              lit(segTokens)), " ")))))
      .select(col(idCol), col("pos").as("seg_idx"), col("col").as("seg"))
  }

  /** Drop every segment whose document frequency reaches `minDocFreq`
    * and reassemble each document's surviving segments in order.
    * Output: `(id, clean_text, n_dropped)` — one row per input doc,
    * `clean_text` empty when everything was boilerplate. */
  def dropCommonSegments(df: DataFrame, idCol: String, textCol: String,
                         segTokens: Int, minDocFreq: Int): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq >= 2: $minDocFreq")
    val segs = tokenSegments(df, idCol, textCol, segTokens)
      .withColumn("__h", TextAnalysis.fingerprint(col("seg")))
    val hot = segs.groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__d"))
      .filter(col("__d") >= minDocFreq)
      .select(col("__h"))
    val kept = segs.join(hot, Seq("__h"), "left_anti")
    val totals = segs.groupBy(col(idCol)).agg(count(lit(1)).as("__total"))
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("__kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            x => x.getField("seg")), " ").as("clean_text"))
    df.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (coalesce(col("__total"), lit(0L)) -
          coalesce(col("__kept"), lit(0L))).as("n_dropped"))
  }
}
