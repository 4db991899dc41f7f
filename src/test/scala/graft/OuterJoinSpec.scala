package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the outer-join and grouping-sets queries: the
  * null-extended rows must actually be present (an inner join would
  * pass a rows>0 check but silently drop the unmatched side). */
class OuterJoinSpec extends SparkSpec {

  test("left_join_counts keeps every customer, including zero-big-order ones") {
    val out = SparkEntry.queries("left_join_counts")(spark, sf0001).cache()
    val nCustomers = graft.io.Tables.customer(spark, sf0001).count()
    assert(out.count() == nCustomers)
    // the big-ticket filter guarantees some customers have no matching
    // order; the left join must surface them as n_big = 0, not drop them
    assert(out.filter(col("n_big") === 0).count() > 0)
    out.unpersist()
  }

  test("outer_join_priorities keeps unmatched keys from BOTH sides") {
    val out = SparkEntry.queries("outer_join_priorities")(spark, sf0001).cache()
    assert(out.filter(col("n_urgent") === 0 && col("n_low") > 0).count() > 0,
      "no right-only rows — full outer degraded to left")
    assert(out.filter(col("n_low") === 0 && col("n_urgent") > 0).count() > 0,
      "no left-only rows — full outer degraded to right")
    assert(out.filter(col("n_urgent") === 0 && col("n_low") === 0).count() == 0,
      "a row with neither an urgent nor a low order cannot exist")
    // key column is total: one row per customer present on either side
    assert(out.select("custkey").distinct().count() == out.count())
    out.unpersist()
  }

  test("grouping_sets_stats emits exactly the two marginal groupings") {
    val out = SparkEntry.queries("grouping_sets_stats")(spark, sf0001).cache()
    // every row belongs to exactly one set: (rf) rows carry ls='ALL',
    // (ls) rows carry rf='ALL'; the (rf, ls) cross rows and the grand
    // total of a cube/rollup must NOT appear
    assert(out.filter(col("rf") =!= "ALL" && col("ls") =!= "ALL").count() == 0)
    assert(out.filter(col("rf") === "ALL" && col("ls") === "ALL").count() == 0)
    val li = graft.io.Tables.lineitem(spark, sf0001)
    val expected = li.select("l_returnflag").distinct().count() +
      li.select("l_linestatus").distinct().count()
    assert(out.count() == expected)
    out.unpersist()
  }
}
