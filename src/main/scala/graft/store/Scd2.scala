package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 — versioned history from a change
  * log, the warehouse twin of [[Snapshots.latest]]'s last-wins SCD-1.
  *
  * The reference keeps no history at all (each upload replaces the
  * corpus wholesale, `/root/reference/App.tsx:41`); [[Snapshots]]
  * generalizes that to named versions of whole corpora. SCD-2 is the
  * per-ROW form: given a log of `(id, ts, attributes…)` observations,
  * emit one row per VERSION of each id — `valid_from`/`valid_to`
  * half-open intervals `[from, to)` with `valid_to` null on the
  * current version — so any historical state is one
  * `valid_from <= t AND (valid_to IS NULL OR t < valid_to)` filter
  * away (the standard point-in-time join shape).
  *
  * Semantics:
  *  - observations that repeat the previous attribute tuple are
  *    CHANGE-SUPPRESSED (they confirm, not version: a daily re-crawl
  *    that re-observes an unchanged document must not open a new
  *    version). Comparison is null-safe on the attribute struct.
  *  - ties on `(id, ts)` order deterministically by the attribute
  *    tuple ascending, so both engines pick the same "previous" row;
  *    a tie with DIFFERENT attributes is contradictory input and
  *    surfaces as two zero-or-more-width versions rather than an
  *    arbitrary winner.
  *
  * Plan shape (the 100 TB contract): everything partitions by the id
  * key — the suppression lag and the interval lead share ONE hash
  * exchange and one sort (same window spec; the filter between them
  * preserves order, so Catalyst re-uses the sort). Per-id state is
  * bounded by that id's change count; there is no global sort, no
  * driver state, no self-join.
  */
object Scd2 {

  /** Build the SCD-2 history table from a change log.
    *
    * @param log      observations: one row per `(id, ts)` sighting
    * @param idCol    the dimension key
    * @param tsCol    observation time (any orderable type)
    * @param attrCols the tracked attributes; a version is a maximal
    *                 run of equal attribute tuples
    * @return `idCol, attrCols…, valid_from, valid_to, is_current`
    */
  def history(log: DataFrame, idCol: String, tsCol: String,
              attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "SCD-2 needs at least one tracked attribute")
    val order = (col(tsCol) +: attrCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(idCol)).orderBy(order: _*)
    val attrs = struct(attrCols.map(col): _*)
    log
      .select((idCol +: tsCol +: attrCols).map(col).toIndexedSeq: _*)
      .withColumn("__prev", lag(attrs, 1).over(w))
      .filter(col("__prev").isNull || !(attrs <=> col("__prev")))
      .drop("__prev")
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tsCol)
  }

  /** [[history]]'s semantics folded locally over ONE key's
    * `(epoch-micros, attribute)` observations — the kernel
    * [[graft.streaming.StreamIngest.scd2Stream]] keeps in per-key
    * state. ORDER-FREE: observations sort under the same
    * `(ts, attribute)` total order the batch windows pin, exact
    * duplicates collapse (a duplicate sighting is a suppressed
    * confirmation either way), and equal-attribute runs suppress —
    * so any delivery order folds to the same version list. Returns
    * `(valid_from, attribute)` per version, ascending; the last entry
    * is the current version. Kept in graft.store so the batch and
    * streaming forms share one definition of the versioning. */
  private[graft] def foldVersions(obs: Seq[(Long, String)]): List[(Long, String)] = {
    val sorted = obs.distinct.sorted
    sorted.foldLeft(List.empty[(Long, String)]) {
      case (acc, (t, a)) =>
        if (acc.headOption.forall(_._2 != a)) (t, a) :: acc else acc
    }.reverse
  }

  /** Point-in-time lookup against a [[history]] table: the version of
    * each id live at `at` (half-open intervals — a version starting
    * exactly at `at` is live). Ids first observed after `at` are
    * absent. A plain filter, no shuffle: compose with a broadcast or
    * co-partitioned join for as-of enrichment. */
  def asOf(history: DataFrame, at: org.apache.spark.sql.Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || at < col("valid_to")))

  /** Point-in-time-CORRECT enrichment: each fact row gains the
    * dimension version live at ITS OWN timestamp (`asof_<attr>`
    * columns, null when the id has no version yet) — the feature-store
    * join that keeps training features leakage-free (a model trained
    * on "state as of the label event" must never see a later version).
    *
    * Because [[history]]'s intervals are CONTIGUOUS per id (each
    * `valid_to` is the next `valid_from`; the last is open), interval
    * membership `valid_from <= t < valid_to` is equivalent to "the
    * latest version with `valid_from <= t`" — so this lowers to the
    * as-of union-and-carry ([[graft.plans.AsOf.asOfJoin]]): one keyed
    * sort over |facts|+|versions| rows per id, never the O(|F|·|V|)
    * range-join fan-out a naive interval join pays per key.
    *
    * Zero-width versions (`valid_from = valid_to`, the contradictory
    * same-instant-tie shape [[history]] surfaces rather than hiding)
    * are live at NO instant under the half-open convention, so they
    * are dropped first — which also makes the carry deterministic:
    * surviving versions are unique per (id, valid_from). Dropping them
    * preserves contiguity (the predecessor's `valid_to` equals the
    * zero-width version's successor's `valid_from`).
    *
    * @param facts    rows to enrich; must carry `idCol` and `tsCol`
    * @param history  a [[history]] output for the same id key
    * @param tsCol    the fact timestamp column (also used internally
    *                 for the carried `valid_from` timeline)
    * @param attrCols the dimension attributes to attach
    * @return facts columns + `asof_<attr>` per requested attribute
    */
  def pointInTimeJoin(facts: DataFrame, history: DataFrame,
                      idCol: String, tsCol: String,
                      attrCols: Seq[String]): DataFrame = {
    val live = history.filter(
      col("valid_to").isNull || col("valid_from") < col("valid_to"))
    val dim = live.select(
      (col(idCol) +: col("valid_from").as(tsCol) +: attrCols.map(col)).toIndexedSeq: _*)
    graft.plans.AsOf.asOfJoin(facts, dim, idCol, tsCol, attrCols)
  }
}
