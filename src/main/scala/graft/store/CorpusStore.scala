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

  /** Partition BACKFILL — the lakehouse `INSERT OVERWRITE ... PARTITION`
    * dynamic mode: only the partitions PRESENT IN `df` are replaced;
    * every other partition's files are untouched (a plain Overwrite
    * would clobber the whole table — the classic reprocessing
    * footgun). This is the day-level reprocessing primitive: recompute
    * one corrupted day, write it back, nothing else moves. The mode
    * rides as a WRITER option, not a session conf, so concurrent
    * writers keep their own semantics. */
  def backfillPartitions(df: DataFrame, path: String,
                         partitionBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty, "backfill needs partition columns")
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionBy: _*)
      .parquet(path)
  }

  /** Compaction write — the small-files remedy for an incrementally
    * appended corpus. Streaming/batch appends leave one file per task
    * per trigger; at 100 TB that is millions of kilobyte files and an
    * O(files) planning cost on every read. This rewrites the corpus
    * range-clustered on `sortCol` (so min/max footer stats make range
    * predicates prune files) with `maxRecordsPerFile` bounding file
    * size WITHOUT a repartition-to-exact-count (which would either
    * skew or over-shuffle): Spark rolls to a new file within each task
    * at the cap. */
  def compact(df: DataFrame, path: String, sortCol: String,
              recordsPerFile: Long, numPartitions: Int = 0): Unit = {
    val clustered =
      if (numPartitions > 0)
        df.repartitionByRange(numPartitions, org.apache.spark.sql.functions.col(sortCol))
      else df.repartitionByRange(org.apache.spark.sql.functions.col(sortCol))
    clustered
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", recordsPerFile)
      .parquet(path)
  }

  /** Readiness predicate (`vectorDb.ts:58-60`): any row exists. Uses a
    * head(1) probe, not count() — no full scan. */
  def isReady(spark: SparkSession, path: String): Boolean =
    scala.util.Try(load(spark, path).head(1).nonEmpty).getOrElse(false)
}
