package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract gate a
  * pipeline runs before trusting a delivered table ("Great
  * Expectations"-style assertions, reduced to their engine core):
  * each expectation names an AGGREGATE observation (a null rate, a
  * distinct ratio, a min/max, a domain-membership rate) and an
  * inclusive [lo, hi] acceptance band; the report is one row per
  * check with the observed value and the verdict.
  *
  * Float discipline: observations should be built from ORDER-FREE
  * aggregates — conditional counts, exact ratios (one IEEE division),
  * min/max — never float sums, whose reduction order is not
  * reproducible across engines or even runs (use the exact-integer-
  * moment patterns elsewhere in `analysis` for means). The observed
  * value rounds to 6 BEFORE the band compare, so verdicts are
  * deterministic except within 5e-7 of a bound (the documented
  * exposure class). A null observation (e.g. `min` of an empty
  * frame) FAILS any bounded check — absence of evidence is not a
  * pass.
  *
  * Scale shape: ALL checks evaluate in ONE aggregate pass over the
  * frame (a single `agg` row, exploded into the report), so adding a
  * check never adds a scan; distinct-count checks ride Spark's
  * multi-distinct expand on the same pass. */
object Expectations {

  /** One check: `observed` must be an aggregate expression; bounds
    * are inclusive, and an absent bound is unconstrained. */
  case class Expectation(name: String, observed: Column,
                         lo: Option[Double] = None,
                         hi: Option[Double] = None)

  /** Null-fraction of a column (exact count ratio). */
  def nullRate(c: Column): Column =
    count(when(c.isNull, lit(1))).cast("double") / count(lit(1))

  /** Distinct-values-to-rows ratio (1.0 ⇔ the column is unique). */
  def uniqueRate(c: Column): Column =
    countDistinct(c).cast("double") / count(lit(1))

  /** Fraction of rows whose value satisfies `pred` (nulls fail it
    * unless the predicate says otherwise). */
  def satisfiedRate(pred: Column): Column =
    count(when(pred, lit(1))).cast("double") / count(lit(1))

  /** Evaluate every expectation in one aggregate pass. Returns
    * `(check, observed, passed)` rows in the declared order. */
  def evaluate(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "at least one expectation")
    val agg = df.agg(
      checks.head.observed.cast("double").as("__o0"),
      checks.tail.zipWithIndex.map { case (c, i) =>
        c.observed.cast("double").as(s"__o${i + 1}")
      }: _*)
    val entries = checks.zipWithIndex.map { case (c, i) =>
      val obs = round(col(s"__o$i"), 6)
      val pass = (c.lo, c.hi) match {
        case (None, None)         => obs.isNotNull || lit(true)
        case (Some(l), None)      => obs >= l
        case (None, Some(h))      => obs <= h
        case (Some(l), Some(h))   => obs >= l && obs <= h
      }
      struct(lit(c.name).as("check"), obs.as("observed"),
        coalesce(pass, lit(false)).as("passed"))
    }
    agg.select(posexplode(array(entries: _*)).as(Seq("__i", "e")))
      .select(col("__i").cast("long").as("check_idx"),
        col("e.check").as("check"), col("e.observed").as("observed"),
        col("e.passed").as("passed"))
  }
}
