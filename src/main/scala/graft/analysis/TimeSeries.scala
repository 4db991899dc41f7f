package graft.analysis

import org.apache.spark.sql.DataFrame
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
}
