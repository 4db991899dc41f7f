package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver test data (TESTDATA.md).
  *
  * The reference keeps its one "table" as an in-memory JS array
  * (`/root/reference/services/vectorDb.ts:4-5`); here every table is a
  * Parquet scan so Catalyst gets pushdown/pruning for free and the data
  * path scales past a single heap.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
  /** `events.ts` has shipped in two physical layouts across testdata
    * generations, so the loader adapts on the INFERRED type and always
    * returns the same logical column: a session-tz (UTC everywhere in
    * this project) micros `TimestampType`.
    *
    *  - parquet TIMESTAMP(NANOS): Spark's vectorized reader refuses it
    *    unless `spark.sql.legacy.parquet.nanosAsLong=true` is set AT
    *    SESSION-BUILD TIME (a runtime `conf.set` is not consulted by
    *    schema inference — measured on 4.1.2); every main in this repo
    *    sets it in its builder, so the column arrives as LongType nanos
    *    and is floored to micros. FLOOR, not `div`: plain `div`
    *    truncates toward zero, rounding pre-epoch (negative) nanos UP
    *    by 1µs; subtracting the non-negative `pmod` remainder first
    *    floors for any sign — the same floor-to-micros DuckDB applies.
    *  - parquet TIMESTAMP(MICROS) without the UTC-adjusted flag (the
    *    current generation): arrives as TimestampNTZType; the cast to
    *    TimestampType under the UTC session zone is value-identical
    *    and keeps every downstream `ts` consumer (date_trunc, window,
    *    epoch casts, oracles) on the type they were written against. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "region")
}
