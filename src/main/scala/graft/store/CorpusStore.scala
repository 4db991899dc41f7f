package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Corpus lifecycle — the Parquet-backed replacement for the reference's
  * in-memory array table (`/root/reference/services/vectorDb.ts:4-9,54-60`):
  *
  *   - `add(...)`   ⇔ `chunks.push(...)`  → append write
  *   - `reset` ⇔ `chunks = []`            → overwrite with next corpus
  *     (the reference resets before each upload, `App.tsx:41` — i.e. one
  *     corpus live at a time, overwrite-on-reload)
  *   - `isReady` ⇔ `count > 0`            → cheap head(1) probe
  *
  * Persistence is an upgrade the reference lacks (browser-tab heap,
  * `vectorDb.ts:5`); query semantics are unchanged. Writes partition by
  * an optional bucket column so a 100 TB corpus lands as prunable files.
  */
object CorpusStore {

  /** Incremental add (`vectorDb.ts:7-9`; called per embedded batch,
    * `App.tsx:79`). */
  def append(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Reset + load new corpus in one atomic overwrite (`vectorDb.ts:54-56`
    * + `App.tsx:41` upload flow). */
  def overwrite(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Readiness predicate (`vectorDb.ts:58-60`): any row exists. Uses a
    * head(1) probe, not count() — no full scan. */
  def isReady(spark: SparkSession, path: String): Boolean =
    scala.util.Try(load(spark, path).head(1).nonEmpty).getOrElse(false)
}
