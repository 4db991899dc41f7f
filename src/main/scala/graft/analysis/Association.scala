package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules (Agrawal & Srikant 1994, Apriori's
  * pair stage) — "which items co-occur in the same basket more than
  * chance": support (co-occurrence count), directional confidence
  * `P(b | a)`, and lift `P(a,b) / (P(a)·P(b))` over item PAIRS. The
  * reference has nothing transactional; this is the engine-extension
  * form of the co-occurrence question `pmi_pairs` answers for text,
  * re-keyed to a basket column (orders, sessions, users).
  *
  * Semantics: presence, not multiplicity — a basket holding an item
  * twice counts once (the `distinct` first stage), matching the
  * standard support definition. Pairs are unordered (`item_a <
  * item_b`); both confidence directions are reported on the one pair
  * row. All counts are exact longs; confidence and lift are single
  * IEEE divisions rounded to 6 — fully oracle-replayable.
  *
  * Scale shape: the pair generation self-joins WITHIN the basket key,
  * so fan-out per basket is C(items, 2) — bounded by basket size,
  * never corpus size (cap pathological mega-baskets upstream — the
  * PPJoin hot-key lesson); supports are map-side-combined keyed
  * reduces; the two item-support lookups are keyed joins (item
  * cardinality can exceed broadcast size at 100 TB); the final top-k
  * is a TakeOrdered over the minSupport-surviving pairs. */
object Association {

  /** Top-`k` item-pair rules from `(basketCol, itemCol)` rows with
    * pair support ≥ `minSupport`, ordered `(support DESC, item_a,
    * item_b)`. Returns `(item_a, item_b, support, supp_a, supp_b,
    * conf_a_to_b, conf_b_to_a, lift)`. */
  def pairRules(items: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long, k: Int): DataFrame = {
    require(minSupport >= 1, s"minSupport >= 1: $minSupport")
    require(k >= 1, s"k >= 1: $k")
    val present = items.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val nBaskets = present.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__n"))
    val itemSupp = present.groupBy(col("__i")).agg(count(lit(1)).as("__s"))
    val pairs = present.as("a")
      .join(present.as("b"),
        col("a.__b") === col("b.__b") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item_a"), col("b.__i").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairs
      .join(itemSupp.withColumnRenamed("__i", "item_a")
        .withColumnRenamed("__s", "supp_a"), Seq("item_a"))
      .join(itemSupp.withColumnRenamed("__i", "item_b")
        .withColumnRenamed("__s", "supp_b"), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("support"),
        col("supp_a"), col("supp_b"),
        round(col("support").cast("double") / col("supp_a"), 6)
          .as("conf_a_to_b"),
        round(col("support").cast("double") / col("supp_b"), 6)
          .as("conf_b_to_a"),
        round(col("support").cast("double") * col("__n") /
          (col("supp_a").cast("double") * col("supp_b")), 6).as("lift"))
      .orderBy(col("support").desc, col("item_a").asc, col("item_b").asc)
      .limit(k)
  }
}
