package graft

import org.apache.spark.sql.functions._

import graft.analysis.Association

/** Association-rule semantics on a hand fixture: presence (not
  * multiplicity), unordered pairs, both confidence directions, lift,
  * minSupport cut, and the (support DESC, items ASC) top-k order. */
class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("pairRules: hand-computed support/confidence/lift, presence semantics") {
    val items = Seq(
      (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"), (2L, "z"),
      (3L, "x"), (3L, "z"),
      (4L, "y"), (4L, "y")) // duplicate presence counts once
      .toDF("basket", "item")
    val got = Association.pairRules(items, "basket", "item", 2L, 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).toSeq
    // N = 4; supp x=3, y=3, z=2; (x,y)=2, (x,z)=2; (y,z)=1 cut
    assert(got == Seq(
      ("x", "y", 2L, 3L, 3L, 0.666667, 0.666667, 0.888889),
      ("x", "z", 2L, 3L, 2L, 0.666667, 1.0, 1.333333)), s"got $got")
  }

  test("pairRules: top-k truncates inside a support tier deterministically") {
    val items = (1 to 3).flatMap(b =>
      Seq((b.toLong, "a"), (b.toLong, "b"), (b.toLong, "c"))).toDF("basket", "item")
    // all three pairs have support 3; k = 2 keeps (a,b), (a,c)
    val got = Association.pairRules(items, "basket", "item", 1L, 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("a", "b"), ("a", "c")), s"got $got")
  }
}
