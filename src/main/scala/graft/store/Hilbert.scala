package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HilbertIndex

/** Hilbert-curve write clustering — the locality-tightened sibling of
  * [[ZOrder]] (Databricks liquid clustering / Amazon Ion-style layout
  * practice). Consecutive Hilbert positions are always grid NEIGHBORS
  * (the Z curve jumps a whole quadrant every 4th step), so range-
  * partitioning files on the h-value gives per-file min/max bounds
  * that are tighter on both dimensions than Z at the same grid — more
  * row groups skipped for the same selective predicate. Measured on
  * our data by the `hilbert_locality` query: mean L1 jump along curve
  * order, Hilbert vs Z, same grid.
  *
  * Same 100 TB framing as [[ZOrder]]: a write-side layout choice —
  * one codegen'd column ([[graft.functions.HilbertIndex]]) plus the
  * range shuffle the write already does; nothing at read time but
  * better stats. Same scaling contract too: both dimensions must be
  * pre-scaled to comparable integer grids (`floor(value / step)`,
  * bucketed ranks), or the wide one dominates the high curve bits.
  */
object Hilbert {
  /** Hilbert index of the cell `(x, y)` on a 2^bits × 2^bits grid.
    * Inputs cast to long and masked to `bits` bits (values beyond the
    * grid alias deterministically — size `bits` to the domain). */
  def hValue(x: Column, y: Column, bits: Int): Column =
    HilbertIndex(x, y, bits)

  /** DuckDB twin of [[hValue]] as a WITH-chain — kept beside the Scala
    * so the two can't drift (the `ZOrder.zSql` convention, except the
    * per-bit state rotation forces a CTE per bit instead of one flat
    * fragment: each stage's (x, y) feed the next, so naming them keeps
    * the SQL linear in `bits` exactly like the codegen loop).
    *
    * Returns a complete `WITH … SELECT <keys>, hd AS <out> FROM …`
    * query over `table`; append ORDER BY as needed. `keys` are
    * passed through every stage. */
  def hSqlCte(keys: Seq[String], xSql: String, ySql: String, bits: Int,
              table: String, out: String = "h"): String = {
    val mask = (1L << bits) - 1L
    val ks = keys.mkString(", ")
    val init =
      s"""hs$bits AS (
         |  SELECT $ks, ((($xSql))::BIGINT & $mask) AS hx,
         |         ((($ySql))::BIGINT & $mask) AS hy, 0::BIGINT AS hd
         |  FROM $table)""".stripMargin
    // stage b consumes bit b: d += s^2 * ((3*rx) XOR ry), then the
    // reflect+transpose rotation of the remaining low bits. (3*rx)^ry
    // is written arithmetically (3*rx + ry - 2*rx*ry — exact on 0/1
    // bits) to stay engine-neutral.
    val stages = (bits - 1).to(0, -1).map { b =>
      val s = 1L << b
      val rx = s"((hx >> $b) & 1)"
      val ry = s"((hy >> $b) & 1)"
      s"""hs$b AS (
         |  SELECT $ks,
         |    CASE WHEN $ry = 1 THEN hx
         |         WHEN $rx = 1 THEN $mask - hy ELSE hy END AS hx,
         |    CASE WHEN $ry = 1 THEN hy
         |         WHEN $rx = 1 THEN $mask - hx ELSE hx END AS hy,
         |    hd + ${s * s} * (3 * $rx + $ry - 2 * $rx * $ry) AS hd
         |  FROM hs${b + 1})""".stripMargin
    }
    (init +: stages).mkString("WITH ", ",\n", "\n") +
      s"SELECT $ks, hd AS $out FROM hs0"
  }

  /** Write `df` as `files` parquet files range-clustered by the
    * Hilbert value of (x, y) — the [[ZOrder.writeZClustered]] shape
    * with the tighter curve. The h column exists only for the
    * shuffle/sort and is dropped from the files. */
  def writeHClustered(df: DataFrame, x: Column, y: Column, bits: Int,
                      files: Int, path: String): Unit =
    df.withColumn("__h", hValue(x, y, bits))
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
}
