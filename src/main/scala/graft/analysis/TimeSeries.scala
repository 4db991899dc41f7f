package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream to a
  * fixed grid and fill the gaps — the feature-engineering step between
  * raw event logs and anything windowed/trained downstream (daily
  * activity features, LOCF sensor panels).
  *
  * Shape at scale: one keyed aggregation to the grid (partial+final),
  * one calendar explode of `keys × buckets` rows driven by two global
  * scalars (min/max bucket — a 1-row broadcast, the `value_histogram`
  * bounds precedent), one keyed left join, and one per-key ordered
  * window for the carry-forward. Nothing global except the 2-scalar
  * bounds; every heavy stage shuffles on the series key.
  */
object TimeSeries {
  /** Daily resample with last-observation-carried-forward.
    *
    * Per (key, day): the LAST observation of the day under the total
    * order `(tsCol, tieCol)`. Days with no observation appear with the
    * previous day's value (`is_gap = 1`); days before a key's first
    * observation carry the `noData` sentinel rather than NULL (NULL
    * cells poison cross-engine hash comparison, and a sentinel keeps
    * the column non-null for downstream schema contracts). The
    * calendar spans the CORPUS min..max day for every key, so all
    * series align on one grid (the panel-data convention).
    */
  def resampleDailyLocf(df: DataFrame, keyCol: String, tsCol: String,
                        valCol: String, tieCol: String,
                        noData: Double = -1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = date_trunc("day", col(tsCol))
    // last observation per (key, day) under a total order
    val perDay = df
      .withColumn("__day", day)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol), col("__day"))
          .orderBy(col(tsCol).desc, col(tieCol).desc)))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("__day"), col(valCol).as("__v"))
    // corpus-wide day bounds: two scalars on a 1-row broadcast
    val bounds = perDay.agg(min(col("__day")).as("__lo"), max(col("__day")).as("__hi"))
    // keys from perDay, not the raw table: identical key set (every
    // event yields a perDay row) and the shared subplan lets Spark
    // reuse the aggregation exchange instead of rescanning the source
    val calendar = perDay.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"),
          expr("interval 1 day"))).as("__day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar
      .join(perDay, Seq(keyCol, "__day"), "left")
      .withColumn("filled", coalesce(
        last(col("__v"), ignoreNulls = true).over(w), lit(noData)))
      .withColumn("is_gap", when(col("__v").isNull, 1L).otherwise(0L))
      .select(col(keyCol), col("__day").as("day"), col("filled"), col("is_gap"))
  }

  /** Daily resample with LINEAR interpolation — the two-sided fill:
    * a gap day between observations gets
    * `prev + (next − prev) · elapsed/gap_span`; before the first /
    * after the last observation the nearest observation extends flat
    * (`kind` distinguishes `0` observed, `1` interpolated, `2` edge).
    * Same grid/keyed-shuffle shape as [[resampleDailyLocf]], plus the
    * mirrored forward window for the next observation — still one
    * partition pass per direction, per key. Day arithmetic is integer
    * (datediff), so the interpolation weights are exact small
    * rationals and the result replays cross-engine under round-6. */
  def resampleDailyInterp(df: DataFrame, keyCol: String, tsCol: String,
                          valCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = date_trunc("day", col(tsCol))
    val perDay = df
      .withColumn("__day", day)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol), col("__day"))
          .orderBy(col(tsCol).desc, col(tieCol).desc)))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("__day"), col(valCol).as("__v"))
    val bounds = perDay.agg(min(col("__day")).as("__lo"), max(col("__day")).as("__hi"))
    // keys from perDay, not the raw table: identical key set (every
    // event yields a perDay row) and the shared subplan lets Spark
    // reuse the aggregation exchange instead of rescanning the source
    val calendar = perDay.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"),
          expr("interval 1 day"))).as("__day"))
    val back = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("__v").isNotNull, col("__day"))
    calendar
      .join(perDay, Seq(keyCol, "__day"), "left")
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__pd", last(obsDay, ignoreNulls = true).over(back))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__nd", first(obsDay, ignoreNulls = true).over(fwd))
      .withColumn("filled",
        when(col("__v").isNotNull, col("__v"))
          .when(col("__pv").isNull, col("__nv")) // before first obs
          .when(col("__nv").isNull, col("__pv")) // after last obs
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            datediff(col("__day"), col("__pd")) /
            datediff(col("__nd"), col("__pd"))))
      .withColumn("kind",
        when(col("__v").isNotNull, 0L)
          .when(col("__pv").isNull || col("__nv").isNull, 2L)
          .otherwise(1L))
      .select(col(keyCol), col("__day").as("day"), col("filled"), col("kind"))
  }

  /** Half-life decayed counters per key — the batch replay of an
    * exponentially-decayed streaming counter (recency-weighted
    * activity, trending detection): each event contributes
    * `2^(−floor(days_ago / halfLifeDays))` toward its key, anchored at
    * the corpus max day (one broadcast scalar). The weights are exact
    * powers of two, so the decayed COUNT is a sum of exact dyadic
    * rationals — order-independent, bit-identical on any engine with
    * no float-summation contract; the value-weighted sum inherits the
    * usual round-to-absorb-reduction-order rule. One scan, partial+
    * final aggregation — at stream scale this is what the counter
    * state folds to on every read. */
  def halfLifeDecayed(df: DataFrame, keyCol: String, tsCol: String,
                      valCol: String, halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays >= 1: $halfLifeDays")
    val day = date_trunc("day", col(tsCol))
    val bounds = df.agg(max(day).as("__mx"))
    df.withColumn("__day", day)
      .crossJoin(broadcast(bounds))
      .withColumn("__w", pow(lit(2.0),
        -floor(datediff(col("__mx"), col("__day")) / lit(halfLifeDays.toDouble))
          .cast("double")))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_raw"),
        round(sum(col("__w")), 6).as("n_decayed"),
        round(sum(col(valCol) * col("__w")), 4).as("value_decayed"))
  }

  /** Rate-spike detection over an event log — the monitoring question
    * "which hours saw anomalously MANY events of this type" (incident
    * spikes, bot bursts, broken retry loops): bucket counts per
    * `(key, hour)`, z-score each bucket against ITS KEY's own
    * mean/stddev over the observed buckets, keep buckets at or above
    * `zMin` standard deviations.
    *
    * Variance is computed EXPLICITLY as `E[n²] − E[n]²` from exact
    * integer sums (counts and squared counts are longs; only the two
    * final divisions and the subtraction are floats) — a fixed IEEE op
    * sequence any engine replays, unlike builtin `stddev_pop`, whose
    * Welford-style accumulation is reduction-order-dependent. The
    * z-score rounds to 6 (the project float contract) BEFORE the
    * threshold, so membership is deterministic except within 5e-7 of
    * the boundary (the documented exposure class). Hours with zero
    * events do not form buckets — the baseline is over OBSERVED hours
    * (the monitoring convention; a silent-hours gate is [[resampleDailyLocf]]'s
    * gap-fill composed upstream). A key with constant counts has zero
    * variance and reports no anomalies — guarded EXPLICITLY
    * (`variance > 0`), because 0/0 is NaN and both Spark and DuckDB
    * order NaN ABOVE every threshold: without the guard a perfectly
    * regular key would flag every hour.
    *
    * Scale shape: two keyed aggregations (hour buckets, then per-key
    * stats — the second input is |keys|·|hours| rows, already tiny)
    * and one broadcast join of the |keys|-row stats. No window, no
    * global sort. */
  def rateAnomalies(events: DataFrame, keyCol: String, tsCol: String,
                    zMin: Double): DataFrame =
    anomaliesFromHourly(events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n")), keyCol, zMin)

  /** The z-score tail of [[rateAnomalies]] over an ALREADY-bucketed
    * `(key, hour, n)` frame — shared by the batch form and the
    * drained-stream report
    * ([[graft.streaming.StreamIngest.anomalyStream]] emits per-key
    * hour→count state; exploding it yields exactly this frame), so
    * stream and batch share one statistical definition. */
  def anomaliesFromHourly(hourly: DataFrame, keyCol: String,
                          zMin: Double): DataFrame = {
    val stats = hourly.groupBy(col(keyCol))
      .agg(sum(col("n")).as("__s"),
        sum(col("n") * col("n")).as("__ss"),
        count(lit(1)).as("__c"))
    val mean = col("__s").cast("double") / col("__c")
    val variance = col("__ss").cast("double") / col("__c") - mean * mean
    hourly.join(broadcast(stats), Seq(keyCol))
      .filter(variance > lit(0.0))
      .withColumn("zscore", round((col("n") - mean) / sqrt(variance), 6))
      .filter(col("zscore") >= zMin)
      .select(col(keyCol), col("hour"), col("n"), col("zscore"))
  }

  /** Per-key activity TREND: the least-squares slope of hourly event
    * counts over each key's observed hours — "is this event type
    * growing or dying", the direction signal [[rateAnomalies]]'s
    * point-spike z cannot see. `x` is the hour offset from the KEY's
    * first observed hour (keeps every moment sum in exact Long range;
    * raw epoch hours would overflow `c·Σx²`), `y` the hour's count;
    * `slope = (c·Σxy − Σx·Σy) / (c·Σx² − Σx·Σx)` with all five moments
    * EXACT integer sums — the only float op is the final division
    * (round-6). A key observed in a single hour has zero denominator
    * and is reported with slope 0 (no trend evidence, not NaN).
    *
    * Scale shape: hour-bucket reduce, a per-key min-hour aggregate
    * joined back (both map-side combined, |keys|·|hours| rows), one
    * |keys|-row moment reduce. No window, no sort. */
  def trendSlopes(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol),
        (unix_micros(date_trunc("hour", col(tsCol))) / lit(3600000000L)).as("__h"))
      .agg(count(lit(1)).as("__y"))
    val firsts = hourly.groupBy(col(keyCol)).agg(min(col("__h")).as("__h0"))
    val m = hourly.join(firsts, Seq(keyCol))
      .select(col(keyCol), (col("__h") - col("__h0")).as("__x"), col("__y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("__c"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"), sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
    val den = m("__c") * m("__sxx") - m("__sx") * m("__sx")
    m.select(col(keyCol), col("__c").as("n_hours"),
      when(den === 0L, lit(0.0))
        .otherwise(round((col("__c") * col("__sxy") - col("__sx") * col("__sy"))
          .cast("double") / den.cast("double"), 6))
        .as("slope_per_hour"))
  }

  /** CUSUM change-point detection over each key's hourly counts —
    * "WHEN did this metric shift", the step-change signal a point-z
    * ([[rateAnomalies]]) and a global slope ([[trendSlopes]]) both
    * miss: the cumulative sum of deviations from the key's own mean
    * peaks in magnitude exactly where a level shift happens (Page's
    * CUSUM, the classic SPC statistic). Reports per key the hour of
    * max |cusum| (ties to the earliest hour) and the round-6 signed
    * cusum there — sign says shift-down-then-up vs up-then-down.
    *
    * Determinism: a float running sum is NOT portable — engines are
    * free to evaluate window aggregates as segment trees rather than
    * left folds, changing the addition order — so the cusum computes
    * ALGEBRAICALLY: `Σ_{j≤i}(n_j − μ) = run_i − i·μ` with `run_i` an
    * exact INTEGER running sum and `i` the hour rank; the only float
    * ops are one multiply and one subtract per row, identical
    * everywhere. cusum rounds to 6 BEFORE the argmax ranking (rank
    * determinism, ties broken on the hour).
    *
    * Scale shape: one hour-bucket reduce, then windows over
    * |hours|-bounded rows per key (the histogramQuantiles contract:
    * windows over bucket rows, never event rows). */
  def changePoints(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy(col(keyCol))
      .agg(sum(col("n")).as("__s"), count(lit(1)).as("__c"))
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("hour").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val wBest = Window.partitionBy(col(keyCol))
      .orderBy(abs(col("cusum")).desc, col("hour").asc)
    hourly.join(broadcast(stats), Seq(keyCol))
      .withColumn("__run", sum(col("n")).over(wRun))
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("cusum",
        round(col("__run") -
          col("__i") * (col("__s").cast("double") / col("__c")), 6))
      .withColumn("__r", row_number().over(wBest))
      .filter(col("__r") === 1)
      .select(col(keyCol), col("hour").as("change_hour"), col("cusum"))
  }

  /** Cross-key activity CORRELATION: Pearson r between every pair of
    * keys' hourly count series over the corpus-wide observed hour
    * grid (hours either key is silent count as 0 — correlation over
    * a shared clock needs aligned series, so the grid is the DISTINCT
    * observed hours crossed with the keys and zero-filled). All five
    * moment sums are exact integers; `r = (cΣxy − ΣxΣy) /
    * (√(cΣx²−(Σx)²)·√(cΣy²−(Σy)²))`, float only in the final
    * sqrt/divide chain (round-6). Degenerate (constant) series have
    * zero variance and report r = 0. The product question: which
    * event families move together (shared funnels, cascading
    * failures) vs independently.
    *
    * Scale shape: the grid is |hours|·|keys| rows (calendar-bounded ×
    * key-bounded — tiny at any corpus size), the pair join is on the
    * hour key with |keys|² fan-out per hour, and the moment reduce is
    * |keys|² rows. The corpus is touched once, by the hourly count
    * reduce. */
  def activityCorrelation(events: DataFrame, keyCol: String,
                          tsCol: String): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("__h"))
      .agg(count(lit(1)).as("__n"))
    val hours = hourly.select(col("__h")).distinct()
    val keys = hourly.select(col(keyCol)).distinct()
    val grid = hours.crossJoin(broadcast(keys))
      .join(hourly, Seq(keyCol, "__h"), "left")
      .select(col(keyCol), col("__h"), coalesce(col("__n"), lit(0L)).as("__n"))
    val m = grid.select(col(keyCol).as("key_a"), col("__h"), col("__n").as("__x"))
      .join(grid.select(col(keyCol).as("key_b"), col("__h"), col("__n").as("__y")),
        Seq("__h"))
      .filter(col("key_a") < col("key_b"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).as("__c"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"), sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val vx = m("__c") * m("__sxx") - m("__sx") * m("__sx")
    val vy = m("__c") * m("__syy") - m("__sy") * m("__sy")
    m.select(col("key_a"), col("key_b"),
      when(vx === 0L || vy === 0L, lit(0.0))
        .otherwise(round((m("__c") * m("__sxy") - m("__sx") * m("__sy")).cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))), 6))
        .as("pearson_r"))
  }

  /** Hour-of-day seasonal profile per key — the intensity index
    * `n(key, hour) · 24 / n(key)`: 1.0 is a flat clock, above 1 the
    * key's busy hours (the baseline [[rateAnomalies]]' per-hour z
    * cannot see, because it scores each wall-clock bucket against the
    * key's GLOBAL mean — a key that's always busy at noon z-flags
    * every noon; this profile is the fix's first half: score against
    * the hour-of-day expectation instead). Exact integer counts, one
    * IEEE multiply+divide, round-6.
    *
    * Scale shape: one keyed reduce to |keys|·24 cells + a |keys|-row
    * totals join. Hours with zero events appear with index 0 via the
    * 24-row grid per key. */
  def seasonalProfile(events: DataFrame, keyCol: String,
                      tsCol: String): DataFrame = {
    val cells = events
      .groupBy(col(keyCol), hour(col(tsCol)).cast("long").as("hour_of_day"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col(keyCol)).agg(sum(col("n")).as("__t"))
    val grid = totals.select(col(keyCol), col("__t"))
      .crossJoin(spark_range24(events))
    grid
      .join(cells, Seq(keyCol, "hour_of_day"), "left")
      .select(col(keyCol), col("hour_of_day"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(coalesce(col("n"), lit(0L)).cast("double") * 24 / col("__t"), 6)
          .as("seasonal_index"))
  }

  private def spark_range24(df: DataFrame): DataFrame =
    df.sparkSession.range(0, 24).select(col("id").as("hour_of_day"))

  /** Rolling active users — per calendar day, the distinct users
    * active THAT day (DAU) and within the trailing `windowDays`-day
    * window ending that day (WAU/MAU for 7/30): the standard product
    * health series a raw daily count can't give, because the window
    * metric must DEDUPLICATE users across days. Days reported are the
    * observed span (min..max activity day); a day with no activity
    * still appears with dau = 0 and whatever its trailing window
    * holds.
    *
    * Scale shape: the corpus reduces ONCE to `(user, day)` presence
    * (map-side-combined distinct); the window metric fans each
    * presence row out to the ≤ `windowDays` report days it supports
    * (bounded ×window blow-up of the PRESENCE set, not the corpus —
    * the standard window-dedup shape) and reduces on the day key with
    * a distinct count; the calendar grid is a |days|-row broadcast.
    * No window function, no global sort. */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays >= 1: $windowDays")
    val presence = events
      .select(col(userCol).as("__u"),
        date_trunc("day", col(tsCol)).cast("date").as("__d"))
      .distinct()
    val span = presence.agg(min(col("__d")).as("__d0"), max(col("__d")).as("__d1"))
    val days = span.select(explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val dau = presence.groupBy(col("__d").as("day"))
      .agg(countDistinct(col("__u")).as("__dau"))
    val windowed = presence
      .select(col("__u"),
        explode(sequence(col("__d"),
          date_add(col("__d"), windowDays - 1))).as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("__u")).as("__wau"))
    days
      .join(dau, Seq("day"), "left")
      .join(windowed, Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("__dau"), lit(0L)).as("dau"),
        coalesce(col("__wau"), lit(0L)).as("active_window"))
  }

  /** Weekly CHURN-LABEL generation — supervised-training rows built
    * leakage-free from the activity log: for every (user, active
    * calendar week), `churn = 1` iff the user has NO activity in the
    * FOLLOWING week, with the current and previous weeks' event counts
    * as point-in-time features (everything a row carries was knowable
    * at its own week's end — the temporal-correctness discipline
    * [[graft.store.Scd2.pointInTimeJoin]] applies to dimensions,
    * applied to label/feature windows). The corpus's LAST active week
    * is censored out: its following week is unobserved, and emitting
    * it as churn=1 would teach the model that the dataset boundary is
    * churn — the classic label-leakage bug this operator exists to
    * avoid.
    *
    * Scale shape: one (user, week) keyed reduce, two self-joins on the
    * shifted week key (keyed, fan-out 1), a 1-row max-week broadcast.
    *
    * @return `(user_id, week, n_events, prev_events, churn)`
    */
  def churnLabels(events: DataFrame, userCol: String,
                  tsCol: String): DataFrame = {
    val uw = events
      .select(col(userCol).as("user_id"),
        date_trunc("week", col(tsCol)).cast("date").as("week"))
      .groupBy(col("user_id"), col("week")).agg(count(lit(1)).as("n_events"))
    val maxWeek = uw.agg(max(col("week")).as("__mw"))
    val next = uw.select(col("user_id"), date_sub(col("week"), 7).as("week"),
      col("n_events").as("__next"))
    val prev = uw.select(col("user_id"), date_add(col("week"), 7).as("week"),
      col("n_events").as("__prev"))
    uw.join(next, Seq("user_id", "week"), "left_outer")
      .join(prev, Seq("user_id", "week"), "left_outer")
      .crossJoin(broadcast(maxWeek))
      .filter(col("week") < col("__mw"))
      .select(col("user_id"), date_format(col("week"), "yyyy-MM-dd").as("week"),
        col("n_events"), coalesce(col("__prev"), lit(0L)).as("prev_events"),
        when(col("__next").isNull, 1L).otherwise(0L).as("churn"))
  }
}
