package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analysis.Funnel

/** Ordered-funnel and retention-cohort semantics against hand-computed
  * fixtures: in-order-only step credit, strict-after tie handling,
  * skipped steps, cohort day assignment, and the one-shuffle plan
  * contract for the funnel. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val steps = Seq("signup", "view", "buy")

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, at) => (u, t, ts(at)) }.toDF("u", "et", "t")

  test("funnel credits steps only in order, strictly after the previous step") {
    val events = ev(
      // user 1: full funnel in order
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 11:00:00"),
      (1L, "buy", "2024-01-01 12:00:00"),
      // user 2: view BEFORE signup (doesn't count), then after -> depth 2
      (2L, "view", "2024-01-01 09:00:00"),
      (2L, "signup", "2024-01-01 10:00:00"),
      (2L, "view", "2024-01-01 10:30:00"),
      // user 3: signup + buy but never view -> buy must not count
      (3L, "signup", "2024-01-01 10:00:00"),
      (3L, "buy", "2024-01-01 11:00:00"),
      // user 4: view at the EXACT signup micros -> strict 'after' rejects it
      (4L, "signup", "2024-01-01 10:00:00"),
      (4L, "view", "2024-01-01 10:00:00"),
      // user 5: no signup at all -> depth 0 everywhere
      (5L, "view", "2024-01-01 10:00:00"),
      (5L, "buy", "2024-01-01 11:00:00"))
    val got = Funnel.funnelCounts(events, "u", "et", "t", steps)
      .orderBy(col("step_idx"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == Seq((0L, "signup", 4L), (1L, "view", 2L), (2L, "buy", 1L)),
      s"got ${got.mkString(",")}")
  }

  test("funnel conversions: from-first and from-prev, round-6") {
    val events = ev(
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 11:00:00"),
      (1L, "buy", "2024-01-01 12:00:00"),
      (2L, "signup", "2024-01-01 10:00:00"),
      (2L, "view", "2024-01-01 11:00:00"),
      (3L, "signup", "2024-01-01 10:00:00"))
    val got = Funnel.funnelCounts(events, "u", "et", "t", steps)
      .orderBy(col("step_idx"))
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(got == Seq(
      ("signup", 3L, 1.0, 1.0),
      ("view", 2L, 0.666667, 0.666667),
      ("buy", 1L, 0.333333, 0.5)), s"got ${got.mkString(",")}")
  }

  test("a later out-of-order occurrence still advances the funnel") {
    // view fires before signup AND again after it: the second one counts
    val events = ev(
      (1L, "view", "2024-01-01 09:00:00"),
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 11:00:00"))
    val got = Funnel.funnelCounts(events, "u", "et", "t", steps)
      .filter(col("step") === "view").select(col("users")).head().getLong(0)
    assert(got == 1L)
  }

  test("funnel is a single user-key shuffle (stacked windows share one exchange)") {
    val events = ev((1L, "signup", "2024-01-01 10:00:00"))
    val qe = Funnel.stepTimes(events, "u", "et", "t", steps).queryExecution
    // every window keyed (no single-partition Window)...
    import org.apache.spark.sql.catalyst.plans.logical
    val unpartitioned = qe.optimizedPlan.collect {
      case w: logical.Window if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty, s"single-partition window in:\n${qe.optimizedPlan}")
    // ...and exactly ONE exchange end-to-end (string count survives the
    // AQE wrapper, whose inner plan collect() does not traverse)
    val planStr = qe.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(planStr).size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges in:\n$planStr")
  }

  test("time-boxed funnel rejects a step completing past the gap") {
    val events = ev(
      // user 1 converts within the hour at every step
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:30:00"),
      (1L, "buy", "2024-01-01 10:45:00"),
      // user 2 views 2h after signup: outside a 1h gap, inside unbounded
      (2L, "signup", "2024-01-01 10:00:00"),
      (2L, "view", "2024-01-01 12:00:00"),
      // user 3 views at EXACTLY the gap bound (inclusive)
      (3L, "signup", "2024-01-01 10:00:00"),
      (3L, "view", "2024-01-01 11:00:00"))
    def users(gap: Option[Long]): Map[String, Long] =
      Funnel.funnelCounts(events, "u", "et", "t", steps, gap)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(users(None) == Map("signup" -> 3L, "view" -> 3L, "buy" -> 1L))
    assert(users(Some(3600L)) == Map("signup" -> 3L, "view" -> 2L, "buy" -> 1L),
      "2h view must miss the 1h gap; the exactly-at-bound view is inclusive")
  }

  test("a missed gap forfeits later steps (first-completion semantics)") {
    // the only view inside the gap is followed by a buy outside it;
    // a later view would have put buy in range, but the funnel anchors
    // on the FIRST in-window completion
    val events = ev(
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:10:00"),
      (1L, "view", "2024-01-01 13:00:00"),
      (1L, "buy", "2024-01-01 13:30:00"))
    val got = Funnel.funnelCounts(events, "u", "et", "t", steps, Some(3600L))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got == Map("signup" -> 1L, "view" -> 1L, "buy" -> 0L))
  }

  test("session funnel: the funnel resets at the inactivity boundary, units are sessions") {
    // user 1 session A: full funnel; then >1h silence; session B: view
    // then buy WITHOUT a signup — B must credit nothing even though
    // the lifetime funnel would chain A's signup to B's view.
    // user 2: signup at the end of session A, view early in session B
    // — the cross-session pair must NOT convert per-session.
    val events = ev(
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:10:00"),
      (1L, "buy", "2024-01-01 10:20:00"),
      (1L, "view", "2024-01-01 14:00:00"),
      (1L, "buy", "2024-01-01 14:05:00"),
      (2L, "signup", "2024-01-01 10:00:00"),
      (2L, "view", "2024-01-01 13:00:00"))
    val got = Funnel.sessionFunnelCounts(events, "u", "et", "t", steps,
        sessionGapSeconds = 3600L)
      .orderBy(col("step_idx")).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    // sessions: u1-A (full funnel), u1-B (no signup), u2-A (signup
    // only), u2-B (no signup) → signup 2, view 1, buy 1
    assert(got == Seq(("signup", 2L), ("view", 1L), ("buy", 1L)),
      s"got ${got.mkString(",")}")
    // same events per-user lifetime: u1 converts once, u2 chains
    // across the silence (lifetime semantics keep it)
    val lifetime = Funnel.funnelCounts(events, "u", "et", "t", steps)
      .orderBy(col("step_idx")).collect().map(_.getLong(2)).toSeq
    assert(lifetime == Seq(2L, 2L, 1L), s"lifetime $lifetime")
  }

  test("session funnel: timestamp ties at a would-be boundary share a session") {
    // two events at the same micros, 2h after the previous: exactly one
    // of the tied rows carries the boundary flag, but the RANGE-frame
    // running sum gives both the same session id — the signup→view
    // pair inside the tie's session must convert.
    val events = ev(
      (1L, "click", "2024-01-01 08:00:00"),
      (1L, "click", "2024-01-01 10:00:00"),
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:30:00"))
    val got = Funnel.sessionFunnelCounts(events, "u", "et", "t", steps,
        sessionGapSeconds = 3600L)
      .orderBy(col("step_idx")).collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 1L, 0L), s"got $got")
  }

  test("sessionStats: bounce, mean events, exact median duration on a hand fixture") {
    val events = ev(
      // u1 session A: 3 events over 30 min; session B: bounce
      (1L, "a", "2024-01-01 10:00:00"),
      (1L, "b", "2024-01-01 10:10:00"),
      (1L, "c", "2024-01-01 10:30:00"),
      (1L, "a", "2024-01-01 14:00:00"),
      // u2: one 2-event session of 10 min
      (2L, "a", "2024-01-01 09:00:00"),
      (2L, "b", "2024-01-01 09:10:00"))
    val r = Funnel.sessionStats(events, "u", "t", sessionGapSeconds = 3600L).head()
    assert(r.getAs[Long]("n_sessions") == 3L)
    assert(r.getAs[Long]("n_bounce") == 1L)
    assert(r.getAs[Double]("bounce_rate") == graft.vector.VectorOps.round6(1.0 / 3))
    assert(r.getAs[Double]("avg_events") == 2.0)
    // durations: 1800, 0, 600 → interpolated median = 600
    assert(r.getAs[Double]("p50_duration_secs") == 600.0)
  }

  test("abTestFunnel: saturated arms yield null z; closed-form z on a mixed fixture") {
    // users 1..4: which hash-bucket variant each lands in is data; what
    // matters is the degenerate guard and the closed-form replay
    val all = ev(
      (1L, "signup", "2024-01-01 10:00:00"), (1L, "view", "2024-01-01 11:00:00"),
      (2L, "signup", "2024-01-01 10:00:00"), (2L, "view", "2024-01-01 11:00:00"))
    val sat = Funnel.abTestFunnel(all, "u", "et", "t", Seq("signup", "view")).head()
    assert(sat.isNullAt(sat.fieldIndex("z")),
      "pooled p = 1 has zero variance — z must be null, not an artifact")
    // mixed outcome: some convert, some don't → real z
    val mixed = ev(
      (1L, "signup", "2024-01-01 10:00:00"), (1L, "view", "2024-01-01 11:00:00"),
      (2L, "signup", "2024-01-01 10:00:00"),
      (3L, "signup", "2024-01-01 10:00:00"), (3L, "view", "2024-01-01 11:00:00"),
      (4L, "signup", "2024-01-01 10:00:00"),
      (5L, "signup", "2024-01-01 10:00:00"),
      (6L, "signup", "2024-01-01 10:00:00"), (6L, "view", "2024-01-01 11:00:00"))
    val r = Funnel.abTestFunnel(mixed, "u", "et", "t", Seq("signup", "view")).head()
    val (na, xa) = (r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"))
    val (nb, xb) = (r.getAs[Long]("n_b"), r.getAs[Long]("conv_b"))
    assert(na + nb == 6L && xa + xb == 3L, s"got $r")
    val pa = xa.toDouble / na; val pb = xb.toDouble / nb
    val pp = (xa + xb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    assert(r.getAs[Double]("z") == graft.vector.VectorOps.round6(z), s"got $r")
  }

  test("markovAccuracy: hold-out prediction scored against the trained argmax") {
    // u1: a→b, b→a, a→b (held out: a→b; trains a→b, b→a)
    // u2: a→b, b→c (held out: b→c; trains a→b)
    // train: a→b ×2, b→a ×1 → pred(a)=b, pred(b)=a
    // eval: u1 holds a→b (correct), u2 holds b→c (pred a, wrong)
    def e(u: Long, t: String, s: Int) =
      (u, t, java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$s%02d"), u * 100 + s)
    val events = Seq(
      e(1L, "a", 1), e(1L, "b", 2), e(1L, "a", 3), e(1L, "b", 4),
      e(2L, "a", 1), e(2L, "b", 2), e(2L, "c", 3)
    ).toDF("u", "et", "t", "id")
    val r = Funnel.markovAccuracy(events, "u", "et", "t", "id").head()
    assert(r.getAs[Long]("n_eval") == 2L && r.getAs[Long]("n_correct") == 1L)
    assert(r.getAs[Double]("accuracy") == 0.5)
  }

  test("top event paths: total-order sequences, sliding n-grams, short users skipped") {
    val events = Seq(
      // user 1: a > b > a > b  ->  a>b>a, b>a>b
      (1L, "a", ts("2024-01-01 10:00:00"), 1L),
      (1L, "b", ts("2024-01-01 11:00:00"), 2L),
      (1L, "a", ts("2024-01-01 12:00:00"), 3L),
      (1L, "b", ts("2024-01-01 13:00:00"), 4L),
      // user 2: same-ts tie broken by event_id: a (id 5) before b (id 6)
      (2L, "b", ts("2024-01-01 10:00:00"), 6L),
      (2L, "a", ts("2024-01-01 10:00:00"), 5L),
      (2L, "b", ts("2024-01-01 11:00:00"), 7L),
      // user 3: only two events -> no 3-gram
      (3L, "a", ts("2024-01-01 10:00:00"), 8L),
      (3L, "b", ts("2024-01-01 11:00:00"), 9L)
    ).toDF("u", "et", "t", "id")
    val got = Funnel.topEventPaths(events, "u", "et", "t", "id", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a>b>a", 1L), ("a>b>b", 1L), ("b>a>b", 1L)), s"got $got")
  }

  test("retention cohorts: first-day assignment, offsets, rates") {
    val events = ev(
      // cohort 01-01: users 1, 2
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-02 10:00:00"),
      (1L, "view", "2024-01-02 12:00:00"), // same day twice -> one active row
      (2L, "view", "2024-01-01 23:59:59"),
      (2L, "view", "2024-01-03 00:00:00"),
      // cohort 01-02: user 3 only
      (3L, "view", "2024-01-02 01:00:00"))
    val got = Funnel.retentionCohorts(events, "u", "t")
      .orderBy(col("cohort_day"), col("offset_days"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 2L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 2L, 0.5),
      ("2024-01-01", 2L, 1L, 2L, 0.5),
      ("2024-01-02", 0L, 1L, 1L, 1.0)), s"got ${got.mkString(",")}")
  }

  test("eventTransitions: per-user consecutive pairs, ts-tie broken by id, no cross-user transition") {
    val events = Seq(
      // user 1: a → b → a → c
      (1L, 1L, "a", "2024-01-01 10:00:00"),
      (2L, 1L, "b", "2024-01-01 10:01:00"),
      (3L, 1L, "a", "2024-01-01 10:02:00"),
      (4L, 1L, "c", "2024-01-01 10:03:00"),
      // user 2: a → b with a ts TIE — event_id 5 before 6
      (6L, 2L, "b", "2024-01-01 09:00:00"),
      (5L, 2L, "a", "2024-01-01 09:00:00"),
      // user 3: single event → no transition (and none into user 1's stream)
      (7L, 3L, "c", "2024-01-01 08:00:00"))
      .map { case (id, u, et, at) => (id, u, et, ts(at)) }
      .toDF("eid", "u", "et", "t")
    val got = Funnel.eventTransitions(events, "u", "et", "t", "eid")
      .orderBy(col("src"), col("dst")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // from a: a>b ×2, a>c ×1; from b: b>a ×1; c is always terminal
    assert(got == Seq(
      ("a", "b", 2L, 0.666667), ("a", "c", 1L, 0.333333),
      ("b", "a", 1L, 1.0)), s"got ${got.mkString(",")}")

    // path surprisal over the same fixture: user 1 averages the three
    // −ln p of its path (rare a>c makes it the outlier), user 2 took
    // only the common a>b hop, user 3 has no transitions → absent
    val sup = Funnel.pathSurprisal(events, "u", "et", "t", "eid", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val r6 = (x: Double) => math.rint(x * 1e6) / 1e6
    val u1 = r6((-math.log(0.666667) - math.log(1.0) - math.log(0.333333)) / 3)
    val u2 = r6(-math.log(0.666667))
    assert(sup == Seq((1L, 3L, u1), (2L, 1L, u2)), s"got ${sup.mkString(",")}")
  }

  test("touchAttribution: strictly-before touches, post-conversion ignored, tie and no-touch converters excluded") {
    val events = Seq(
      // user 1: view → click → purchase; a view AFTER conversion must not count
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 10:30:00"),
      (3L, 1L, "purchase", "2024-01-01 11:00:00"),
      (4L, 1L, "view", "2024-01-01 12:00:00"),
      // user 2: purchase with no prior event — nothing to credit
      (5L, 2L, "purchase", "2024-01-01 09:00:00"),
      // user 3: click at the EXACT conversion ts — not strictly before
      (6L, 3L, "click", "2024-01-01 08:00:00"),
      (7L, 3L, "purchase", "2024-01-01 08:00:00"),
      // user 4: two purchases — conversion is the FIRST; signup credits both models
      (8L, 4L, "signup", "2024-01-01 07:00:00"),
      (9L, 4L, "purchase", "2024-01-01 09:00:00"),
      (10L, 4L, "purchase", "2024-01-01 10:00:00"))
      .map { case (id, u, et, at) => (id, u, et, ts(at)) }
      .toDF("eid", "u", "et", "t")
    val got = Funnel.touchAttribution(events, "u", "et", "t", "eid", "purchase")
      .orderBy(col("model"), col("et")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("first_touch", "signup", 1L), ("first_touch", "view", 1L),
      ("last_touch", "click", 1L), ("last_touch", "signup", 1L)),
      s"got ${got.mkString(",")}")
  }

  test("survivalCurve: hand-computed KM with censoring and strict-after entry") {
    val events = ev(
      // converter, bucket 0 (30 min)
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "buy", "2024-01-01 10:30:00"),
      // converter, bucket 2 (2.5 h)
      (2L, "signup", "2024-01-01 10:00:00"),
      (2L, "buy", "2024-01-01 12:30:00"),
      // entrant, never converts — censored at study end (13:00), 3 h
      (3L, "signup", "2024-01-01 10:00:00"),
      // converter, bucket 1 (1.5 h)
      (4L, "signup", "2024-01-01 09:00:00"),
      (4L, "buy", "2024-01-01 10:30:00"),
      // not an entrant; also pins the study end at 13:00
      (5L, "view", "2024-01-01 13:00:00"),
      // buy BEFORE signup doesn't convert — censored at 4 h
      (6L, "buy", "2024-01-01 08:00:00"),
      (6L, "signup", "2024-01-01 09:00:00"))
    val got = Funnel.survivalCurve(events, "u", "et", "t", "signup", "buy", 3600L)
      .orderBy(col("t_bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // N = 5 entrants; events at buckets 0, 1, 2; censors at 3 and 4.
    // n_risk: 5, 4, 3 -> S = 0.8, 0.8*0.75 = 0.6, 0.6*(2/3) = 0.4
    assert(got == Seq(
      (0L, 5L, 1L, 0.8), (1L, 4L, 1L, 0.6), (2L, 3L, 1L, 0.4)),
      s"got ${got.mkString(",")}")
  }

  test("survivalCurve: no censoring reaches 0; all-censored is empty") {
    val all = ev(
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "buy", "2024-01-01 10:10:00"),
      (2L, "signup", "2024-01-01 10:00:00"),
      (2L, "buy", "2024-01-01 11:10:00"))
    val got = Funnel.survivalCurve(all, "u", "et", "t", "signup", "buy", 3600L)
      .orderBy(col("t_bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((0L, 2L, 1L, 0.5), (1L, 1L, 1L, 0.0)),
      s"got ${got.mkString(",")}")
    val none = ev(
      (1L, "signup", "2024-01-01 10:00:00"),
      (2L, "view", "2024-01-01 12:00:00"))
    assert(Funnel.survivalCurve(none, "u", "et", "t", "signup", "buy", 3600L)
      .count() == 0L)
  }

  test("cupedAbTest: hand-computed theta and adjusted means") {
    // Knuth buckets: users 2,4,5 -> arm a; 1,3 -> arm b. Pre/post
    // counts (x, y): u2 (2,4), u4 (1,1), u5 (3,5), u1 (2,2), u3 (1,3)
    // => theta = 20/14, pooled mean_x = 1.8, rho^2 = 400/700.
    def n(u: Long, day: Int, k: Int) = (0 until k).map(i =>
      (u, "e", f"2024-01-$day%02d 0$i:00:00"))
    val events = ev(
      (n(2L, 10, 2) ++ n(2L, 20, 4) ++ n(4L, 10, 1) ++ n(4L, 20, 1) ++
        n(5L, 10, 3) ++ n(5L, 20, 5) ++ n(1L, 10, 2) ++ n(1L, 20, 2) ++
        n(3L, 10, 1) ++ n(3L, 20, 3)): _*)
    val r = Funnel.cupedAbTest(events, "u", "t", "2024-01-16 00:00:00").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L, s"arm sizes $r")
    assert(r.getDouble(2) == 3.333333 && r.getDouble(3) == 2.5, s"means $r")
    assert(r.getDouble(4) == 1.428571, s"theta $r")
    assert(r.getDouble(5) == 3.047619 && r.getDouble(6) == 2.928571,
      s"adjusted $r")
    assert(r.getDouble(7) == 0.119048 && r.getDouble(8) == 0.571429,
      s"diff/vr $r")
  }

  test("pageRankLocal: symmetric cycle is uniform; dangling mass redistributes") {
    // a <-> b with equal weight: the stationary point is uniform and
    // every iteration stays exactly there
    val cyc = Funnel.pageRankLocal(Seq(("a", "b", 1L), ("b", "a", 1L)), 0.85, 7)
    assert(cyc == Seq(("a", 0.5), ("b", 0.5)), s"got $cyc")
    // a -> b (2), a -> c (1), b -> a (1); c dangles. One iteration
    // from uniform, hand-computed (round-6).
    val got = Funnel.pageRankLocal(
      Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "a", 1L)), 0.85, 1)
      .map { case (k, v) => (k, graft.vector.VectorOps.round6(v)) }
    assert(got == Seq(("a", 0.427778), ("b", 0.333333), ("c", 0.238889)),
      s"got $got")
    // mass conservation after several iterations
    val r5 = Funnel.pageRankLocal(
      Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "a", 1L)), 0.85, 5)
    assert(math.abs(r5.map(_._2).sum - 1.0) < 1e-9, s"sum ${r5.map(_._2).sum}")
  }

  test("transitionPageRank: matches the local fold over extracted transitions") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:01:00"),
      (1L, "buy", "2024-01-01 10:02:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 10:01:00"),
      (3L, "click", "2024-01-01 10:00:00"),
      (3L, "view", "2024-01-01 10:01:00"))
      .withColumn("eid", col("u") * 10 + unix_micros(col("t")) % 7)
    val got = Funnel.transitionPageRank(events, "u", "et", "t", "eid",
        0.85, 3)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq.sortBy(_._1)
    val expected = Funnel.pageRankLocal(
      Seq(("view", "click", 2L), ("click", "buy", 1L), ("click", "view", 1L)),
      0.85, 3).map { case (k, v) => (k, graft.vector.VectorOps.round6(v)) }
    assert(got == expected, s"got $got vs $expected")
  }

  test("cupedAbTest: zero pre-period variance degrades to the plain diff") {
    // every user has x = 1 -> varX = 0 -> theta = 0, adj == raw means
    val events = ev(
      (1L, "e", "2024-01-10 10:00:00"), (1L, "e", "2024-01-20 10:00:00"),
      (2L, "e", "2024-01-10 10:00:00"), (2L, "e", "2024-01-20 10:00:00"),
      (2L, "e", "2024-01-20 11:00:00"))
    val r = Funnel.cupedAbTest(events, "u", "t", "2024-01-16 00:00:00").head()
    assert(r.getDouble(4) == 0.0, s"theta $r")
    assert(r.getDouble(5) == r.getDouble(2) && r.getDouble(6) == r.getDouble(3),
      s"adj == raw $r")
    assert(r.getDouble(8) == 0.0, s"vr $r")
  }

  test("maxConcurrentSessions: hand-computed peak across hour boundaries, touching sessions overlap") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // gap 1800s → per-user sessions:
    //  u1: [00:10, 02:10] (events every 20 min), u2: [00:50, 01:20],
    //  u3: [02:10, 02:15] — touches u1's end exactly (inclusive → overlap)
    val ev = Seq(
      (1L, "00:10"), (1L, "00:30"), (1L, "00:50"), (1L, "01:10"),
      (1L, "01:30"), (1L, "01:50"), (1L, "02:10"),
      (2L, "00:50"), (2L, "01:20"),
      (3L, "02:10"), (3L, "02:15")
    ).map { case (u, t) => (u, ts(s"2024-01-01 $t:00")) }.toDF("user_id", "ts")
    val r = Funnel.maxConcurrentSessions(ev, "user_id", "ts", 1800L).head()
    assert(r.getLong(0) == 3L, s"3 sessions expected: $r")
    // peak 2: u1+u2 between 00:50 and 01:20, and u1+u3 at exactly 02:10
    assert(r.getLong(1) == 2L, s"peak must be 2: $r")
    // without u3's touching start the peak is still 2 (u1+u2) but
    // dropping u2 isolates every interval except the touch point
    val r2 = Funnel.maxConcurrentSessions(
      ev.filter(col("user_id") =!= 2L), "user_id", "ts", 1800L).head()
    assert(r2.getLong(1) == 2L,
      "a session STARTING exactly at another's end counts as concurrent")
  }

  test("linearAttribution: even credit per touch, mass conserved, post-conversion excluded") {
    import spark.implicits._
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ev = Seq(
      (1L, "click", ts(0)), (1L, "view", ts(1)), (1L, "click", ts(2)),
      (1L, "purchase", ts(3)), (1L, "view", ts(4)), // post-conversion: no credit
      (2L, "view", ts(0)), (2L, "purchase", ts(1)),
      (3L, "click", ts(0)) // never converts: no credit
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.linearAttribution(ev, "user_id", "event_type", "ts", "purchase")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // user 1: 3 touches → click 2/3, view 1/3; user 2: view 1
    assert(out == Map("click" -> 0.666667, "view" -> 1.333333), s"got $out")
    assert(math.abs(out.values.sum - 2.0) < 1e-6,
      "credit mass must equal the number of converting users with touches")
  }
}
