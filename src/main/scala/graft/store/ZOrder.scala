package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional write clustering — the lakehouse
  * `OPTIMIZE ZORDER BY` primitive (Delta/Iceberg practice; Morton
  * 1966). Interleaving the bits of two columns makes a RANGE partition
  * on the z-value a tiling of 2-D space: every output file then holds
  * a spatially compact block, so parquet min/max stats are tight on
  * BOTH columns and a predicate on EITHER dimension (or both) skips
  * row groups. A 1-D sort gives perfect skipping on its own column
  * and NONE on the other — the second dimension's min/max spans the
  * whole domain in every file (spec-measured: the value-only query
  * reads every row of a user-sorted layout and a fraction of the
  * z-clustered one).
  *
  * At 100 TB this is a write-side layout choice, not a query-side
  * operator: one extra codegen'd column + the range shuffle the write
  * was already doing; every later scan with a selective predicate on
  * either clustered dimension reads a subset of files. The z column
  * is integer bit arithmetic, so the cell assignment replays exactly
  * in any engine ([[zSql]]).
  */
object ZOrder {
  /** Morton-interleave the low `bits` bits of two non-negative
    * integral columns (x in even positions, y in odd). Values ≥ 2^bits
    * truncate to their low bits — deterministic (and cross-engine
    * identical), but cells alias; size `bits` to the domain.
    *
    * Interleaving is POSITIONAL: a dimension that only reaches bit 4
    * while the other reaches bit 9 contributes nothing to the high
    * z bits, so range-clustering on z degenerates to a 1-D sort on
    * the wide dimension and the narrow one stops skipping
    * (spec-measured). Scale each dimension to a comparable integer
    * grid first — `floor(value / step)`, bucketed ranks, epoch
    * minutes — the caller picks the grid, exactly as lakehouse
    * OPTIMIZE ZORDER implementations normalize columns to range ids
    * before interleaving. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    zValueN(Seq(x, y), bits)

  /** N-COLUMN Morton interleave — lakehouse `OPTIMIZE ZORDER BY (c1,
    * …, cn)` takes any column list, so the kernel does too: bit `b` of
    * dimension `i` lands at z-bit `b·n + i` (the 2-D layout is the
    * n = 2 case: x even, y odd). The bit-width scaling contract
    * generalizes unchanged — all n dimensions must be scaled to
    * comparable integer grids or the wide one dominates the high bits
    * (see [[zValue]]); total interleaved width `n·bits` must fit a
    * signed 64-bit value. More dimensions = coarser per-dimension
    * resolution at fixed width: skipping weakens as n grows (each
    * file's bounding box tightens in every dimension but by fewer bits
    * each) — the standard lakehouse guidance of z-ordering by the few
    * genuinely-filtered columns, not every column. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "at least one dimension")
    require(bits >= 1 && n * bits <= 63,
      s"1 <= bits and n*bits <= 63 (n=$n, bits=$bits): the interleave must fit a signed long")
    (0 until bits).flatMap { b =>
      cols.zipWithIndex.map { case (c, i) =>
        shiftright(c, b).bitwiseAND(lit(1L)) * lit(1L << (n * b + i))
      }
    }.reduce(_ + _)
  }

  /** SQL fragment computing [[zValue]] — kept beside the Scala so the
    * two can't drift (the `KmvSketch.hashSql` convention). */
  def zSql(x: String, y: String, bits: Int): String = zSqlN(Seq(x, y), bits)

  /** SQL fragment computing [[zValueN]]. */
  def zSqlN(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    (0 until bits).flatMap(b =>
      cols.zipWithIndex.map { case (c, i) =>
        s"((($c) >> $b) & 1) * ${1L << (n * b + i)}"
      }).mkString(" + ")
  }

  /** Write `df` as `files` parquet files range-clustered by the
    * z-value of (x, y) — column expressions, so derived dimensions
    * (`floor(value)`) cluster without being stored. The z column
    * exists only for the shuffle/sort and is dropped from the files. */
  def writeZClustered(df: DataFrame, x: Column, y: Column, bits: Int,
                      files: Int, path: String): Unit =
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
