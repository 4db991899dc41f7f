package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.store.ZOrder

/** Z-order clustering: the Morton interleave arithmetic against hand
  * computations, write round-trip losslessness, and the actual layout
  * claim measured through scan metrics — a predicate on the dimension
  * a 1-D sort ignores full-scans that layout but skips row groups on
  * the z-clustered one. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave matches hand-computed Morton codes") {
    // z(x=2, y=1, 4 bits): x bits 0,1 -> even slots; y bits 1,0 -> odd
    // slots: 0*1 + 1*2 + 1*4 + 0*8 = 6. And the classics: z(1,0)=1,
    // z(0,1)=2, z(3,3)=15, plus truncation of bits >= `bits`.
    val got = Seq((1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L), (5L, 0L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 2).as("z2"),
        ZOrder.zValue(col("x"), col("y"), 4).as("z4"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L), (15L, 15L), (6L, 6L),
      (1L, 17L))) // x=5: 2 bits keep only 0b01 -> 1; 4 bits see 0b101 -> 17
  }

  test("N-column interleave: 2-D case ≡ zValue; 3-D hand codes; SQL fragment agrees") {
    // n=2 must reproduce the classic layout bit for bit
    val two = Seq((5L, 3L), (0L, 7L), (6L, 6L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 5).as("a"),
        ZOrder.zValueN(Seq(col("x"), col("y")), 5).as("b"))
      .collect()
    two.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // 3-D: bit b of dim i lands at 3b+i. z(1,1,1,1bit)=0b111=7;
    // z(1,0,0)=1, z(0,1,0)=2, z(0,0,1)=4; z(2,0,0,2bits)=bit1 of x at
    // slot 3 -> 8; z(1,2,3,2bits)= x:1->1; y:0b10->bit1 at 3+1=16;
    // z:0b11->bit0 at 2 (4) + bit1 at 5 (32) = 36; total 1+16+36=53
    val three = Seq((1L, 1L, 1L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
        (2L, 0L, 0L), (1L, 2L, 3L)).toDF("x", "y", "w")
      .select(ZOrder.zValueN(Seq(col("x"), col("y"), col("w")), 2).as("z"))
      .collect().map(_.getLong(0))
    assert(three.toSeq == Seq(7L, 1L, 2L, 4L, 8L, 53L), s"got ${three.toSeq}")
    // the generated SQL fragment replays the Scala kernel exactly
    Seq((9L, 4L, 13L), (31L, 0L, 31L), (1023L, 512L, 7L))
      .toDF("x", "y", "w").createOrReplaceTempView("zn_probe")
    val viaSql = spark.sql(
      s"SELECT ${ZOrder.zSqlN(Seq("x", "y", "w"), 10)} AS z FROM zn_probe")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = spark.table("zn_probe")
      .select(ZOrder.zValueN(Seq(col("x"), col("y"), col("w")), 10).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol, s"SQL $viaSql vs Column $viaCol")
  }

  private def scanRows(df: DataFrame, location: String): Long = {
    df.collect() // run THIS plan so the metrics belong to it
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains(location)))
      .getOrElse(fail(s"no parquet scan over $location"))
      .metrics("numOutputRows").value
  }

  test("z-clustered layout skips on BOTH dimensions; 1-D sort only on its own") {
    val events = graft.io.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("value"))
    val total = events.count()
    val root = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // z-clustered on comparable 4-bit grids (user_id 0..14; value/32
    // 0..10 — interleaving is positional, so both dims must reach
    // similar bit widths to share the high z bits) vs user_id-sorted
    val zdir = s"$root/zorder"
    ZOrder.writeZClustered(events, col("user_id"),
      floor(col("value") / 32).cast("long"), 4, 8, zdir)
    val udir = s"$root/usort"
    events.repartitionByRange(8, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(udir)

    def q(path: String, pred: org.apache.spark.sql.Column): Long =
      scanRows(spark.read.parquet(path).filter(pred), path)

    // dim-2-only predicate: the user-sorted layout CANNOT skip (every
    // file's value min/max spans the domain); z-clustered files are
    // value-compact so row groups drop out. The band must clear whole
    // blocks: each z file spans ~2 value-grid cells (~64 raw), so a
    // predicate above most blocks' max prunes them; a 70-wide band in
    // the middle of the domain overlaps every block and prunes nothing.
    val valuePred = col("value") >= 150
    val zValueRows = q(zdir, valuePred)
    val uValueRows = q(udir, valuePred)
    assert(uValueRows == total,
      s"expected the 1-D layout to full-scan on the other dim: $uValueRows/$total")
    assert(zValueRows < total,
      s"expected z-layout row-group skipping on value: $zValueRows/$total")

    // dim-1 predicate: both layouts skip
    val userPred = col("user_id") === 3
    assert(q(zdir, userPred) < total)
    assert(q(udir, userPred) < total)
  }

  test("writeZClustered is lossless (same multiset of rows)") {
    val events = graft.io.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("value"))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-rt").toString
    ZOrder.writeZClustered(events, col("user_id"),
      floor(col("value")).cast("long"), 9, 4, s"$dir/t")
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == events.count())
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
    assert(!back.columns.contains("__z"), "the clustering key must not persist")
  }
}
