package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities. First line of defense at scale is AQE
  * (`spark.sql.adaptive.skewJoin.enabled` splits oversized join
  * partitions at runtime); these helpers cover the aggregation-side
  * hot-key case AQE does not: a groupBy where one key holds a large
  * fraction of all rows lands that key's entire partial state on one
  * reducer. Salting splits each key into `salt` sub-keys for a partial
  * aggregate, then merges the partials — two small shuffles instead of
  * one skewed one.
  *
  * The salt uses a deterministic per-row hash (not rand()) so results
  * are reproducible and retries/speculative tasks agree.
  */
object Skew {

  private def saltCol(salt: Int, cols: Seq[Column]): Column =
    pmod(hash(cols: _*), lit(salt))

  /** Salted count: count per key, skew-safe. ≡ groupBy(key).count(). */
  def saltedCount(df: DataFrame, keyCol: String, salt: Int,
                  saltSource: Seq[String]): DataFrame =
    df.withColumn("__salt", saltCol(salt, saltSource.map(col)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n"))

  /** Salted sum: sum(valueCol) per key, skew-safe.
    * ≡ groupBy(key).agg(sum(value)). */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String, salt: Int,
                saltSource: Seq[String]): DataFrame =
    df.withColumn("__salt", saltCol(salt, saltSource.map(col)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("sum_value"))

  /** Replicated broadcast join for a skewed stream side: explode the
    * small side over all salt values, salt the big side's key, join on
    * (key, salt). Use when a handful of keys dominate a shuffle join and
    * the small side fits in a broadcast. */
  def saltedBroadcastJoin(big: DataFrame, small: DataFrame, keyCol: String,
                          salt: Int, saltSource: Seq[String]): DataFrame = {
    val bigSalted = big.withColumn("__salt", saltCol(salt, saltSource.map(col)))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigSalted.join(broadcast(smallReplicated), Seq(keyCol, "__salt")).drop("__salt")
  }
}
