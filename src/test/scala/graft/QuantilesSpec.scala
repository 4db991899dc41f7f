package graft

import org.apache.spark.sql.functions._

import graft.analysis.Quantiles

/** Histogram-sketch quantiles: error bound against the exact rank
  * value, partition-order invariance (the mergeability claim), and the
  * bounded-state shape. */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sf0001/lineitem.parquet")

  test("estimate is within width/2 of the exact rank value") {
    val width = 100.0
    val qs = Seq(0.5, 0.95)
    val est = Quantiles.histogramQuantiles(li, "l_extendedprice", "l_returnflag",
        width, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byFlag = li.select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((flag, vals) <- byFlag; q <- qs) {
      val rankValue = vals(math.ceil(q * vals.length).toInt - 1)
      val e = est((flag, q))
      assert(math.abs(e - rankValue) <= width / 2.0 + 1e-9,
        s"$flag q=$q: est $e vs exact $rankValue exceeds width/2")
    }
  }

  test("result is invariant to partitioning (merge order): 1 vs 16 partitions") {
    def run(parts: Int): Seq[(String, Double, Double)] =
      Quantiles.histogramQuantiles(li.repartition(parts), "l_extendedprice",
          "l_returnflag", 100.0, Seq(0.25, 0.5, 0.75, 0.95, 0.99))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
        .toSeq.sorted
    assert(run(1) == run(16))
  }

  test("constant column collapses to one bucket; estimate is its midpoint") {
    val df = Seq.fill(100)(("g", 250.0)).toDF("g", "v")
    val out = Quantiles.histogramQuantiles(df, "v", "g", 100.0, Seq(0.5, 0.99))
      .collect().map(_.getDouble(2)).toSeq
    assert(out == Seq(250.0, 250.0)) // bucket 2 → midpoint (2+0.5)*100
  }

  test("bucket counts keep the cumulative window off the data rows") {
    // the window input must be the aggregated histogram (≤ range/width
    // rows per group), never raw rows: Window must sit ABOVE the
    // partial+final aggregate in the plan
    // NOTE: plans render top-down, and the quantile SELECTION step
    // (min(__b) per (group, q)) is itself a HashAggregate that sits
    // ABOVE the Window — so anchor on the count-aggregate BELOW the
    // window, not the first HashAggregate in the string.
    val plan = Quantiles.histogramQuantiles(li, "l_extendedprice", "l_returnflag",
        100.0, Seq(0.5)).queryExecution.executedPlan.toString
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0, s"no Window in plan:\n${plan.take(1500)}")
    val below = plan.substring(winIdx)
    val countAgg = below.linesIterator.find(l =>
      l.contains("HashAggregate") && l.contains("count("))
    assert(countAgg.isDefined,
      s"window must consume the count-aggregated buckets (no count-HashAggregate " +
        s"below the Window):\n${plan.take(1500)}")
  }

  test("null values are ignored, matching percentile() semantics") {
    val df = (Seq.fill(99)(("g", Some(250.0))) :+ (("g", None: Option[Double])))
      .toDF("g", "v")
    val out = Quantiles.histogramQuantiles(df, "v", "g", 100.0, Seq(0.5, 0.99))
      .collect().map(_.getDouble(2)).toSeq
    // the null row must not land in a null bucket or inflate __n
    assert(out == Seq(250.0, 250.0))
  }

  test("equiDepthHistogram: near-equal depths on distinct data, edges unbounded, empty bins legal") {
    // 0..79 into 4 bins: octile boundaries land between values → 20 each
    val df = (0 until 80).map(_.toDouble).toDF("v")
    val rows = Quantiles.equiDepthHistogram(df, "v", 4)
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._4).toSeq == Seq(20L, 20L, 20L, 20L), s"got ${rows.toSeq}")
    assert(rows.head._2.isNegInfinity && rows.last._3.isPosInfinity)
    // interior boundaries chain: bin i's hi == bin i+1's lo
    rows.sliding(2).foreach { case Array(a, b) => assert(a._3 == b._2) }
    // counts cover everything
    assert(rows.map(_._4).sum == 80L)
    // duplicate-heavy column: collapsed boundaries leave empty interior
    // bins rather than double-counting — total mass preserved
    val dup = Seq.fill(100)(1.0).toDF("v")
    val drows = Quantiles.equiDepthHistogram(dup, "v", 4)
      .orderBy(col("bin")).collect().map(_.getLong(3))
    assert(drows.sum == 100L)
    assert(drows.count(_ == 0L) == 3, s"got ${drows.toSeq}")
  }

  test("madOutliers: modified z flags the outlier; zero MAD flags nothing") {
    import graft.analysis.Quantiles
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 100.0))
      .toDF("id", "v")
    val got = Quantiles.madOutliers(df, "id", "v", 3.5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    // med = 3, MAD = 1: only 100 crosses 3.5 (0.6745 * 97)
    assert(got == Seq((5L, 65.4265)), s"got $got")
    val flat = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 99.0)).toDF("id", "v")
    assert(Quantiles.madOutliers(flat, "id", "v", 3.5).count() == 0L,
      "zero MAD must flag nothing")
  }
}
