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
}
