package graft

import org.apache.spark.sql.functions._

import graft.store.{Hilbert, ZOrder}

/** Hilbert layout curve: the codegen walk against a plain-Scala mirror
  * of the classic xy2d algorithm, the defining curve properties
  * (bijection + unit-step adjacency) checked exhaustively on a full
  * grid, the masking contract, the write round trip, and the actual
  * layout claim — per-block bounding boxes at least as tight as Z on
  * the same grid. */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  // JVM mirror of HilbertIndex (same algorithm, plain longs)
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << bits) - 1L
    var x = x0 & mask; var y = y0 & mask; var d = 0L
    var b = bits - 1
    while (b >= 0) {
      val s = 1L << b
      val rx = (x >> b) & 1L
      val ry = (y >> b) & 1L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = mask - x; y = mask - y }
        val t = x; x = y; y = t
      }
      b -= 1
    }
    d
  }

  test("hand values on the 2x2 and 4x4 grids") {
    // bits=1 classics: (0,0)->0 (0,1)->1 (1,1)->2 (1,0)->3
    val got1 = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .select(Hilbert.hValue(col("x"), col("y"), 1).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got1 == Seq(0L, 1L, 2L, 3L))
    // bits=2: the first U-turn — curve order starts (0,0) (1,0) (1,1)
    // (0,1) then climbs to (0,2)
    val got2 = Seq((0L, 0L), (1L, 0L), (1L, 1L), (0L, 1L), (0L, 2L))
      .toDF("x", "y")
      .select(Hilbert.hValue(col("x"), col("y"), 2).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got2 == Seq(0L, 1L, 2L, 3L, 4L), s"got $got2")
  }

  test("8x8 grid: bijection onto 0..63, consecutive cells are grid neighbors, mirror agrees") {
    val cells = (for { x <- 0 to 7; y <- 0 to 7 } yield (x.toLong, y.toLong))
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"), Hilbert.hValue(col("x"), col("y"), 3).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, h) => assert(h == xy2d(3, x, y)) }
    val byD = got.map { case (x, y, h) => h -> ((x, y)) }.sortBy(_._1)
    assert(byD.map(_._1).toSeq == (0L until 64L), "not a bijection")
    byD.sliding(2).foreach { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("masking: coordinates beyond the grid alias to their low bits") {
    val got = Seq((9L, 4L), (1L, 1L)).toDF("x", "y")
      .select(Hilbert.hValue(col("x"), col("y"), 3).as("h"))
      .collect().map(_.getLong(0))
    assert(got(0) == xy2d(3, 1L, 4L)) // 9 & 7 == 1
    assert(got(1) == xy2d(3, 1L, 1L))
  }

  test("aligned blocks are perfect squares; curve steps beat Z's jumps") {
    // full 64x64 grid. Two layers to the locality claim:
    // (a) blocks of 64 ALIGNED curve positions are 8x8 squares (area
    //     == count) — for aligned power-of-4 blocks Z ties this (its
    //     aligned blocks are squares too; the bbox gap appears on
    //     skewed data where file cuts land mid-square, which is what
    //     the `hilbert_locality` query measures on events);
    // (b) the defining differentiator: the mean L1 step between
    //     CONSECUTIVE curve positions is exactly 1 for Hilbert (every
    //     step is a grid neighbor) while Z pays a quadrant-diagonal
    //     jump every 4th step — mean > 1. Unaligned file cuts inherit
    //     exactly this difference.
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("gx", "gy")
    val h = grid.select(shiftright(Hilbert.hValue(col("gx"), col("gy"), 6), 6)
        .as("blk"), col("gx"), col("gy"))
      .groupBy("blk")
      .agg(((max(col("gx")) - min(col("gx")) + 1) *
        (max(col("gy")) - min(col("gy")) + 1)).as("area"))
      .agg(avg(col("area"))).head().getDouble(0)
    assert(h == 64.0, s"Hilbert blocks of 64 positions must be 8x8 squares, got $h")

    def meanStep(curve: org.apache.spark.sql.Column): Double = {
      val cells = grid.select(curve.as("d"), col("gx"), col("gy"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      cells.sliding(2).map { case Array((_, x1, y1), (_, x2, y2)) =>
        (math.abs(x1 - x2) + math.abs(y1 - y2)).toDouble
      }.sum / (cells.length - 1)
    }
    val hs = meanStep(Hilbert.hValue(col("gx"), col("gy"), 6))
    val zs = meanStep(ZOrder.zValue(col("gx"), col("gy"), 6))
    assert(hs == 1.0, s"Hilbert mean curve step must be exactly 1, got $hs")
    assert(zs > 1.5, s"Z pays diagonal jumps, expected mean step > 1.5, got $zs")
  }

  test("writeHClustered is lossless and drops the curve key") {
    val events = graft.io.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("value"))
    val dir = java.nio.file.Files.createTempDirectory("graft-hilbert-rt").toString
    Hilbert.writeHClustered(events, col("user_id"),
      floor(col("value")).cast("long"), 9, 4, s"$dir/t")
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == events.count())
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
    assert(!back.columns.contains("__h"), "the clustering key must not persist")
  }
}
