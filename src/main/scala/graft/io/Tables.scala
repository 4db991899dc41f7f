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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader refuses; read nanos as long (legacy conf) and convert to a
    * micros timestamp with FLOOR division — the same floor-to-micros
    * DuckDB applies when it reads the file. Plain `div` truncates toward
    * zero, which would round pre-epoch (negative) nanos UP by 1µs;
    * subtracting the non-negative `pmod` remainder first floors for any
    * sign. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "region")
}
