package graft

import org.apache.spark.sql.functions._

import graft.store.MaterializedAgg

/** IVM contract: refresh(view, delta) ≡ build(base ∪ delta) exactly —
  * new keys insert, seen keys fold, empty delta is identity. */
class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private def rows(r: (String, Long)*) = r.toDF("k", "v")
  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("refresh folds seen keys, inserts unseen, equals full rebuild") {
    val base = rows(("a", 5L), ("a", 1L), ("b", 7L))
    val delta = rows(("a", 10L), ("c", 2L))
    val refreshed = MaterializedAgg.refresh(
      MaterializedAgg.build(base, Seq("k"), "v"), delta, Seq("k"), "v")
    val full = MaterializedAgg.build(base.unionByName(delta), Seq("k"), "v")
    assert(collect(refreshed) == collect(full), "refresh must equal rebuild")
    assert(collect(refreshed) == Seq(
      ("a", 3L, 16L, 1L, 10L), ("b", 1L, 7L, 7L, 7L), ("c", 1L, 2L, 2L, 2L)))
  }

  test("empty delta is the identity; view-less keys come purely from the delta") {
    val base = rows(("a", 5L))
    val view = MaterializedAgg.build(base, Seq("k"), "v")
    val same = MaterializedAgg.refresh(view, rows().limit(0), Seq("k"), "v")
    assert(collect(same) == collect(view))
  }

  test("refreshWithDeletes ≡ rebuild on survivors: extremum deletion, interior deletion, key removal") {
    val base = rows(("a", 1L), ("a", 5L), ("a", 9L),
      ("b", 3L), ("b", 4L), ("b", 8L), ("c", 2L))
    val view = MaterializedAgg.build(base, Seq("k"), "v")
    // delete a's MAX (forces a rescan of a), b's INTERIOR row (stored
    // extrema stand — no rescan), and ALL of c (the key leaves)
    val deletes = rows(("a", 9L), ("b", 4L), ("c", 2L))
    val survivors = rows(("a", 1L), ("a", 5L), ("b", 3L), ("b", 8L))
    val out = MaterializedAgg.refreshWithDeletes(
      view, survivors, deletes, Seq("k"), "v")
    val full = MaterializedAgg.build(survivors, Seq("k"), "v")
    assert(collect(out) == collect(full), "delete refresh must equal rebuild")
    assert(collect(out) == Seq(("a", 2L, 6L, 1L, 5L), ("b", 2L, 11L, 3L, 8L)))
  }

  test("refreshWithDeletes: empty delete set is the identity") {
    val base = rows(("a", 5L), ("b", 2L))
    val view = MaterializedAgg.build(base, Seq("k"), "v")
    val out = MaterializedAgg.refreshWithDeletes(
      view, base, rows().limit(0), Seq("k"), "v")
    assert(collect(out) == collect(view))
  }
}
