package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a keyed aggregate view — the batch form
  * of the engine's stream ≡ batch contract: a materialized
  * `(keys → count, sum, min, max)` table is REFRESHED from a delta
  * batch by merging partial aggregate states (count adds, sum adds,
  * min/max fold), never by rescanning the base. This is classic
  * algebraic IVM (incremental view maintenance) restricted to
  * self-maintainable aggregates under APPENDS — the ingest shape the
  * reference actually has (`/root/reference/vectorDb.ts:7-9` is
  * append-only; deletes would need count-per-state bookkeeping and
  * are out of scope, documented).
  *
  * The refresh contract is EXACT for count/sum(integer)/min/max
  * (associative + commutative over exact values — refresh ≡ full
  * recompute row-for-row, spec-pinned); float sums would be
  * reduction-order-exposed and are deliberately not offered (the
  * project float contract — use DECIMAL upstream if a float measure
  * must ride a view).
  *
  * Scale shape: the delta aggregates alone (map-side combined —
  * O(|delta|) work however large the view), then one keyed outer
  * merge join against the view. At 100 TB the view update touches
  * only the delta's key partitions; the base table is never read. */
object MaterializedAgg {

  /** Build the initial view: per `keys`, `n` + sum/min/max of
    * `valueCol` (a LONG measure — see float note above). */
  def build(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum"),
        min(col(valueCol)).as("min"), max(col(valueCol)).as("max"))

  /** Merge a delta batch into an existing view: unseen keys insert,
    * seen keys fold state. Exact refresh ≡ [[build]] over base ∪
    * delta. */
  def refresh(view: DataFrame, delta: DataFrame, keys: Seq[String],
              valueCol: String): DataFrame = {
    val d = build(delta, keys, valueCol)
      .withColumnsRenamed(Map("n" -> "__dn", "sum" -> "__dsum",
        "min" -> "__dmin", "max" -> "__dmax"))
    def mergeNum(a: String, b: String, f: (Column, Column) => Column): Column =
      when(col(a).isNull, col(b)).when(col(b).isNull, col(a))
        .otherwise(f(col(a), col(b)))
    view.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        mergeNum("n", "__dn", _ + _).as("n"),
        mergeNum("sum", "__dsum", _ + _).as("sum"),
        mergeNum("min", "__dmin", least(_, _)).as("min"),
        mergeNum("max", "__dmax", greatest(_, _)).as("max")): _*)
  }

  /** Maintain the view under DELETES — the retraction case the
    * append-only [[refresh]] documents as out of scope, closed with
    * the classic split: count/sum RETRACT algebraically (no rescan at
    * all — they are group homomorphisms), while min/max are not
    * retractable, so exactly the RISKY keys — those whose deleted
    * batch touched the current extremum (`deleted min <= view min` or
    * `deleted max >= view max`) — recompute their extrema from the
    * survivor rows; every other key keeps its stored extrema
    * untouched. Keys whose count reaches zero leave the view.
    *
    * `survivors` is the base AFTER deletion (the caller owns row
    * identity — e.g. an id anti-join); it is read ONLY through a
    * semi-join on the risky keys, so at scale the rescan touches the
    * affected keys' partitions, not the base. Contract (spec-pinned):
    * result ≡ [[build]] over `survivors`, row-for-row.
    *
    * Deleting rows of a key absent from the view is a caller error
    * and surfaces as a negative count rather than silence. */
  def refreshWithDeletes(view: DataFrame, survivors: DataFrame,
                         deletes: DataFrame, keys: Seq[String],
                         valueCol: String): DataFrame = {
    val d = build(deletes, keys, valueCol)
      .withColumnsRenamed(Map("n" -> "__dn", "sum" -> "__dsum",
        "min" -> "__dmin", "max" -> "__dmax"))
    val retracted = view.join(d, keys, "left_outer")
      .select(keys.map(col) ++ Seq(
        (col("n") - coalesce(col("__dn"), lit(0L))).as("n"),
        (col("sum") - coalesce(col("__dsum"), lit(0L))).as("sum"),
        col("min"), col("max"), col("__dmin"), col("__dmax")): _*)
      .filter(col("n") > 0)
    val risky = retracted
      .filter(col("__dmin").isNotNull &&
        (col("__dmin") <= col("min") || col("__dmax") >= col("max")))
      .select(keys.map(col): _*)
    val recomputed = build(survivors.join(risky, keys, "left_semi"),
        keys, valueCol)
      .select(keys.map(col) :+ col("min").as("__rmin") :+ col("max").as("__rmax"): _*)
    retracted.join(recomputed, keys, "left_outer")
      .select(keys.map(col) ++ Seq(col("n"), col("sum"),
        coalesce(col("__rmin"), col("min")).as("min"),
        coalesce(col("__rmax"), col("max")).as("max")): _*)
  }
}
