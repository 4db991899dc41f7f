package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analysis.TimeSeries

/** Resample + LOCF gap-fill against a closed-form fixture: last-of-day
  * selection under the total order, multi-day carry-forward, the
  * pre-first-observation sentinel, and grid alignment across keys. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap-fill: last-of-day, LOCF across gaps, sentinel before first obs") {
    val events = Seq(
      // key A, day 1: two observations -> later ts wins
      ("A", ts("2024-01-01 08:00:00"), 10.0, 1L),
      ("A", ts("2024-01-01 17:00:00"), 11.0, 2L),
      // key A, day 3 (day 2 is a gap)
      ("A", ts("2024-01-03 09:00:00"), 33.0, 3L),
      // key B: only day 2 (day 1 precedes its first observation)
      ("B", ts("2024-01-02 12:00:00"), 20.0, 4L)
    ).toDF("k", "t", "v", "id")
    val got = TimeSeries.resampleDailyLocf(events, "k", "t", "v", "id")
      .select(col("k"), date_format(col("day"), "yyyy-MM-dd").as("d"),
        col("filled"), col("is_gap"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sorted
    assert(got == Seq(
      ("A", "2024-01-01", 11.0, 0L), // last of day 1
      ("A", "2024-01-02", 11.0, 1L), // gap: carried forward
      ("A", "2024-01-03", 33.0, 0L),
      ("B", "2024-01-01", -1.0, 1L), // before B's first observation
      ("B", "2024-01-02", 20.0, 0L),
      ("B", "2024-01-03", 20.0, 1L)  // carried to the corpus grid's end
    ), s"got $got")
  }

  test("same-timestamp ties break on the tie column (higher id wins)") {
    val events = Seq(
      ("A", ts("2024-01-01 08:00:00"), 1.0, 1L),
      ("A", ts("2024-01-01 08:00:00"), 2.0, 2L)
    ).toDF("k", "t", "v", "id")
    val got = TimeSeries.resampleDailyLocf(events, "k", "t", "v", "id")
      .collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(2.0))
  }

  test("linear interpolation: exact weights between obs, flat at the edges") {
    val events = Seq(
      ("A", ts("2024-01-01 08:00:00"), 12.0, 1L),
      ("A", ts("2024-01-04 08:00:00"), 42.0, 2L),
      ("B", ts("2024-01-02 12:00:00"), 20.0, 3L)
    ).toDF("k", "t", "v", "id")
    val got = TimeSeries.resampleDailyInterp(events, "k", "t", "v", "id")
      .select(col("k"), date_format(col("day"), "yyyy-MM-dd").as("d"),
        round(col("filled"), 6).as("f"), col("kind"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sorted
    assert(got == Seq(
      ("A", "2024-01-01", 12.0, 0L),
      ("A", "2024-01-02", 22.0, 1L), // 12 + 30*(1/3)
      ("A", "2024-01-03", 32.0, 1L), // 12 + 30*(2/3)
      ("A", "2024-01-04", 42.0, 0L),
      ("B", "2024-01-01", 20.0, 2L), // edge: back-filled flat
      ("B", "2024-01-02", 20.0, 0L),
      ("B", "2024-01-03", 20.0, 2L),
      ("B", "2024-01-04", 20.0, 2L)
    ), s"got $got")
  }

  test("half-life decay: exact dyadic weights, anchored at corpus max day") {
    val events = Seq(
      ("A", ts("2024-01-15 10:00:00"), 8.0, 1L),  // day 0: weight 1
      ("A", ts("2024-01-08 10:00:00"), 8.0, 2L),  // 7 days ago: 1/2
      ("A", ts("2024-01-01 10:00:00"), 8.0, 3L),  // 14 days ago: 1/4
      ("B", ts("2024-01-09 10:00:00"), 4.0, 4L)   // 6 days ago: weight 1
    ).toDF("k", "t", "v", "id")
    val got = TimeSeries.halfLifeDecayed(events, "k", "t", "v", 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq.sorted
    assert(got == Seq(
      ("A", 3L, 1.75, 14.0), // 1 + 1/2 + 1/4; 8*(1 + .5 + .25)
      ("B", 1L, 1.0, 4.0)
    ), s"got $got")
  }

  test("rateAnomalies: closed-form z against the key's own baseline; constant keys silent") {
    // key A: hourly counts 1,1,1,5 → mean 2, var = (1+1+1+25)/4 − 4 = 3,
    // z(5) = 3/sqrt(3) = sqrt(3) ≈ 1.732051; z(1) < 0
    val ev = (
      Seq.tabulate(1)(i => ("A", ts("2024-01-01 00:10:00"), i)) ++
      Seq.tabulate(1)(i => ("A", ts("2024-01-01 01:10:00"), i)) ++
      Seq.tabulate(1)(i => ("A", ts("2024-01-01 02:10:00"), i)) ++
      Seq.tabulate(5)(i => ("A", ts("2024-01-01 03:10:00"), i)) ++
      // key B: constant 2/hour → zero variance → never anomalous
      Seq.tabulate(2)(i => ("B", ts("2024-01-01 00:20:00"), i)) ++
      Seq.tabulate(2)(i => ("B", ts("2024-01-01 01:20:00"), i))
    ).toDF("k", "t", "i")
    val hits = TimeSeries.rateAnomalies(ev, "k", "t", 1.7)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(hits.toSeq == Seq(("A", 5L, 1.732051)), s"got ${hits.toSeq}")
    // raising the bar above sqrt(3) silences A too
    assert(TimeSeries.rateAnomalies(ev, "k", "t", 1.8).count() == 0)
  }

  test("trendSlopes: exact closed-form slope; single-hour key reports 0") {
    // key A: counts 1,2,3 at hours 0,1,2 → slope exactly 1.0
    val ev = (
      Seq.tabulate(1)(i => ("A", ts("2024-01-01 00:10:00"), i)) ++
      Seq.tabulate(2)(i => ("A", ts("2024-01-01 01:10:00"), i)) ++
      Seq.tabulate(3)(i => ("A", ts("2024-01-01 02:10:00"), i)) ++
      Seq.tabulate(4)(i => ("B", ts("2024-01-01 05:00:00"), i))
    ).toDF("k", "t", "i")
    val got = TimeSeries.trendSlopes(ev, "k", "t")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("A") == ((3L, 1.0)), s"got ${got("A")}")
    assert(got("B") == ((1L, 0.0)), "single observed hour has no trend evidence")
  }

  test("activityCorrelation: perfectly aligned series r=1, opposed r=-1, silent hours zero-fill") {
    // A and B move together over 3 hours; C moves opposite; D constant
    def rows(k: String, ns: Seq[Int]) = ns.zipWithIndex.flatMap { case (n, h) =>
      Seq.fill(n)((k, ts(s"2024-01-01 0$h:30:00"), 0))
    }
    val ev = (rows("A", Seq(1, 2, 3)) ++ rows("B", Seq(2, 4, 6)) ++
      rows("C", Seq(3, 2, 1)) ++ rows("D", Seq(1, 1, 1))).toDF("k", "t", "i")
    val got = TimeSeries.activityCorrelation(ev, "k", "t")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("A", "B")) == 1.0 && got(("A", "C")) == -1.0)
    assert(got(("A", "D")) == 0.0, "zero-variance series must report r=0")
    assert(got.size == 6, "all unordered pairs present")
  }

  test("changePoints: the cusum peak lands at the level shift") {
    // key A: counts 1,1,1,5,5,5 → mean 3; cusum -2,-4,-6,-4,-2,0 →
    // peak |cusum| at hour 2 (the last low hour), value -6
    val ev = (0 until 6).flatMap { h =>
      Seq.fill(if (h < 3) 1 else 5)(("A", ts(s"2024-01-01 0$h:15:00"), h))
    }.toDF("k", "t", "i")
    val r = TimeSeries.changePoints(ev, "k", "t").head()
    assert(r.getAs[java.sql.Timestamp]("change_hour") == ts("2024-01-01 02:00:00"),
      s"got $r")
    assert(r.getAs[Double]("cusum") == -6.0, s"got $r")
  }

  test("rollingActiveUsers: dedup across days, silent days zero-DAU, window carry") {
    import java.sql.Timestamp
    val events = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"), // same day dedups
      (2L, "2024-01-01 12:00:00"),
      (1L, "2024-01-02 09:00:00"),                              // u1 again next day
      (3L, "2024-01-05 09:00:00"))                              // gap: 01-03/04 silent
      .map { case (u, t) => (u, Timestamp.valueOf(t)) }.toDF("u", "t")
    val got = graft.analysis.TimeSeries.rollingActiveUsers(events, "u", "t", 3)
      .orderBy(col("day")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // window 3d: 01-01 {1,2}; 01-02 {1,2}; 01-03 {1,2}; 01-04 {1}; 01-05 {3}
    assert(got == Seq(
      ("2024-01-01", 2L, 2L), ("2024-01-02", 1L, 2L), ("2024-01-03", 0L, 2L),
      ("2024-01-04", 0L, 1L), ("2024-01-05", 1L, 1L)), s"got $got")
  }

  test("every stage shuffles on the series key: no single-partition window") {
    val events = graft.io.Tables.events(spark, sf0001)
    val plan = TimeSeries.resampleDailyLocf(events, "user_id", "ts", "value", "event_id")
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical
    val unpartitioned = plan.collect {
      case w: logical.Window if w.partitionSpec.isEmpty => w
      case w: logical.WindowGroupLimit if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty, s"single-partition window in:\n$plan")
  }

  test("churnLabels: gap weeks churn, censored last week never emits") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 12:00:00")
    // weeks (Mon-start): W1=2024-01-01 W2=01-08 W3=01-15 W4=01-22
    val ev = Seq(
      (1L, ts("2024-01-02")), (1L, ts("2024-01-03")), // A: W1 ×2
      (1L, ts("2024-01-16")),                         // A: W3
      (2L, ts("2024-01-04")), (2L, ts("2024-01-08")), // B: W1, W2,
      (2L, ts("2024-01-18")), (2L, ts("2024-01-22"))  //    W3, W4
    ).toDF("user_id", "ts")
    val out = TimeSeries.churnLabels(ev, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // A@W1: 2 events, no W2 activity → churn; A@W3: W4 silent → churn
    assert(out((1L, "2024-01-01")) == ((2L, 0L, 1L)))
    assert(out((1L, "2024-01-15")) == ((1L, 0L, 1L)))
    // B continuous: churn 0 with prev-week features carried
    assert(out((2L, "2024-01-01")) == ((1L, 0L, 0L)))
    assert(out((2L, "2024-01-08")) == ((1L, 1L, 0L)))
    assert(out((2L, "2024-01-15")) == ((1L, 1L, 0L)))
    // W4 is the corpus max week — censored, for BOTH users
    assert(!out.keySet.exists(_._2 == "2024-01-22"),
      "the unobservable last week must never become a labeled row")
    assert(out.size == 5)
  }
}
