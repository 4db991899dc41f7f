package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.store.Scd2

/** SCD-2 history: change suppression, half-open intervals, tie
  * determinism, and the point-in-time lookup. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val log = Seq(
    // id 1: A → A (suppressed) → B → B (suppressed) → A
    (1L, ts("2024-01-01 00:00:00"), "A"),
    (1L, ts("2024-01-02 00:00:00"), "A"),
    (1L, ts("2024-01-03 00:00:00"), "B"),
    (1L, ts("2024-01-04 00:00:00"), "B"),
    (1L, ts("2024-01-05 00:00:00"), "A"),
    // id 2: single observation → one open current version
    (2L, ts("2024-01-02 12:00:00"), "X")
  ).toDF("id", "t", "state")

  private def hist = Scd2.history(log, "id", "t", Seq("state"))

  test("change suppression: repeat observations confirm, not version") {
    val rows = hist.filter(col("id") === 1L)
      .orderBy(col("valid_from"))
      .select("state", "valid_from", "valid_to", "is_current")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B", "A"),
      "A,A,B,B,A must collapse to versions A,B,A")
    // half-open intervals chain exactly: each valid_to = next valid_from
    assert(rows(0).getTimestamp(1) == ts("2024-01-01 00:00:00"))
    assert(rows(0).getTimestamp(2) == ts("2024-01-03 00:00:00"),
      "suppressed re-observation must not close the version early")
    assert(rows(1).getTimestamp(2) == ts("2024-01-05 00:00:00"))
    assert(rows(2).getTimestamp(2) == null && rows(2).getBoolean(3),
      "last version stays open and current")
    assert(rows.count(_.getBoolean(3)) == 1, "exactly one current version per id")
  }

  test("single-observation id yields one open version") {
    val r = hist.filter(col("id") === 2L).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("state") == "X")
    assert(r.head.getAs[Timestamp]("valid_to") == null)
  }

  test("asOf: point-in-time lookup honors the half-open convention") {
    // at exactly a version start, the NEW version is live
    val atChange = Scd2.asOf(hist, lit(ts("2024-01-03 00:00:00")))
      .filter(col("id") === 1L).collect()
    assert(atChange.length == 1 && atChange.head.getAs[String]("state") == "B")
    // before an id's first observation it is absent
    val early = Scd2.asOf(hist, lit(ts("2024-01-01 06:00:00")))
    assert(early.filter(col("id") === 2L).count() == 0)
    assert(early.filter(col("id") === 1L).head().getAs[String]("state") == "A")
  }

  test("same-timestamp tie orders by the attribute tuple — deterministic both runs") {
    val tied = Seq(
      (1L, ts("2024-01-01 00:00:00"), "B"),
      (1L, ts("2024-01-01 00:00:00"), "A"),
      (1L, ts("2024-01-02 00:00:00"), "A")
    ).toDF("id", "t", "state")
    def run = Scd2.history(tied, "id", "t", Seq("state"))
      .orderBy(col("valid_from"), col("state")).collect().toSeq
    val first = run
    assert(run == first, "must be rerun-identical")
    // attr-ascending tie order: A sorts before B at the tied instant,
    // so versions are A (zero-width at the tie), B, then the later A
    // is a REAL change vs B
    val states = first.map(_.getAs[String]("state"))
    assert(states == Seq("A", "B", "A"), s"got $states")
  }

  test("foldVersions kernel ≡ the batch windows, any delivery order") {
    val events = graft.io.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_type"))
    val byUser = events.select(col("user_id"), unix_micros(col("ts")), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).toSeq }
    val batch = Scd2.history(events, "user_id", "ts", Seq("event_type"))
      .select(col("user_id"), unix_micros(col("valid_from")), col("event_type"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).sorted.toList }
    byUser.foreach { case (u, obs) =>
      // fold a shuffled delivery — order-free by construction
      val shuffled = new scala.util.Random(u).shuffle(obs)
      assert(Scd2.foldVersions(shuffled).sorted == batch(u), s"user $u diverges")
    }
  }

  test("pointInTimeJoin: leakage-free version attach at each fact instant") {
    val facts = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")), // exactly at A's start → A
      (2L, 1L, ts("2024-01-02 12:00:00")), // mid-A (after suppressed re-obs) → A
      (3L, 1L, ts("2024-01-03 00:00:00")), // exactly at the A→B boundary → B (half-open)
      (4L, 1L, ts("2024-01-04 18:00:00")), // inside B → B, NEVER the later A (leakage)
      (5L, 1L, ts("2024-01-09 00:00:00")), // after last change → open current A
      (6L, 2L, ts("2024-01-01 00:00:00"))  // before id 2's first version → null
    ).toDF("fact_id", "id", "t")
    val out = Scd2.pointInTimeJoin(facts, hist, "id", "t", Seq("state"))
      .orderBy(col("fact_id"))
      .select(col("fact_id"), col("asof_state")).collect()
    val got = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "A" && got(2L) == "A")
    assert(got(3L) == "B", "a version starting exactly at the fact instant is live")
    assert(got(4L) == "B", "a LATER version must never leak backward onto a fact")
    assert(got(5L) == "A")
    assert(got(6L) == null, "facts before the id's first version carry null")
  }

  test("pointInTimeJoin drops zero-width versions — live at no instant") {
    val tied = Seq(
      (1L, ts("2024-01-01 00:00:00"), "B"),
      (1L, ts("2024-01-01 00:00:00"), "A")
    ).toDF("id", "t", "state")
    val h = Scd2.history(tied, "id", "t", Seq("state"))
    val facts = Seq((1L, 1L, ts("2024-01-01 00:00:00")),
                    (2L, 1L, ts("2024-06-01 00:00:00"))).toDF("fact_id", "id", "t")
    val out = Scd2.pointInTimeJoin(facts, h, "id", "t", Seq("state"))
      .orderBy(col("fact_id")).select(col("asof_state")).collect()
    // the zero-width A ([t,t)) never attaches; B is live from t on
    assert(out.map(_.getString(0)).toSeq == Seq("B", "B"))
  }

  test("multi-attribute tuples version on ANY attribute change, null-safely") {
    val multi = Seq(
      (1L, ts("2024-01-01 00:00:00"), "A", Some(1)),
      (1L, ts("2024-01-02 00:00:00"), "A", None),
      (1L, ts("2024-01-03 00:00:00"), "A", None),
      (1L, ts("2024-01-04 00:00:00"), "A", Some(1))
    ).toDF("id", "t", "s1", "s2")
    val h = Scd2.history(multi, "id", "t", Seq("s1", "s2"))
      .orderBy(col("valid_from")).collect()
    // null-safe compare: (A,null)==(A,null) suppresses; null↔1 versions
    assert(h.length == 3, s"expected 3 versions, got ${h.length}")
  }
}
