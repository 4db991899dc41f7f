package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over an event stream — ordered funnels and
  * retention cohorts, the two standard product-analytics reductions of
  * an `(user, event_type, ts)` log.
  *
  * The reference has no event analytics at all (its only "events" are
  * React UI callbacks, `/root/reference/App.tsx:26-101`); these are
  * extension operators for the training-data/product-log side of the
  * engine, shaped for the 100 TB log: every stage shuffles on the user
  * key (or on day-bucket keys bounded by the calendar), nothing
  * collects per-user state to the driver, and the per-user width is
  * O(#steps) columns regardless of how many events a user has.
  */
object Funnel {

  /** Per-user ordered-funnel completion times: one row per user,
    * `__t0 … __t{n-1}` = the earliest time the user completed step i
    * IN ORDER (step i counts only events STRICTLY after `__t{i-1}`;
    * ties at the exact same micros do not advance the funnel — both
    * engines agree because the comparison is on exact micros values).
    *
    * Plan shape: the step times are STACKED per-user windows (no ORDER
    * BY, so no per-partition sort) — every window shares one hash
    * exchange on the user key, and the closing per-user aggregate is
    * co-partitioned with it, so the whole funnel is ONE shuffle of the
    * projected `(user, type, ts)` rows. Window i's filter references
    * window i-1's column, which Catalyst stacks in the same Window
    * operator chain without re-exchanging. */
  def stepTimes(events: DataFrame, userCol: String, typeCol: String,
                tsCol: String, steps: Seq[String],
                maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapSeconds.forall(_ > 0), "maxGapSeconds must be positive")
    val w = Window.partitionBy(col(userCol))
    val withSteps = stackTimes(
      events.select(col(userCol), col(typeCol), col(tsCol)),
      w, typeCol, tsCol, steps, maxGapSeconds)
    val stepAggs = steps.indices.map(i => first(col(s"__t$i")).as(s"__t$i"))
    withSteps.groupBy(col(userCol)).agg(stepAggs.head, stepAggs.tail: _*)
  }

  /** The stacked min-when window fold shared by the lifetime and
    * per-session step times: adds `__t0 … __t{n-1}` over window `w`
    * (which must partition by whatever unit the funnel is evaluated
    * in — user, or (user, session)). */
  private def stackTimes(df: DataFrame,
                         w: org.apache.spark.sql.expressions.WindowSpec,
                         typeCol: String, tsCol: String, steps: Seq[String],
                         maxGapSeconds: Option[Long]): DataFrame =
    steps.zipWithIndex.foldLeft(df) {
      case (d, (step, i)) =>
        val hit =
          if (i == 0) col(typeCol) === lit(step)
          else {
            val after = col(typeCol) === lit(step) && col(tsCol) > col(s"__t${i - 1}")
            // time-boxed funnel: step i must land within the gap of
            // step i-1's completion (the "converted within N hours"
            // product question); inclusive bound, exact micros both
            // engines
            maxGapSeconds.fold(after)(g =>
              after && col(tsCol) <= col(s"__t${i - 1}") + expr(s"INTERVAL $g SECOND"))
          }
        d.withColumn(s"__t$i", min(when(hit, col(tsCol))).over(w))
    }

  /** Per-SESSION step times: the funnel evaluated inside activity
    * sessions instead of over the user's lifetime — "did the visit
    * convert", the form session-scoped product analytics asks.
    * Sessions are inactivity-gap derived from ALL of the user's events
    * (`events_sessions`' semantics): a gap > `sessionGapSeconds` since
    * the previous event starts a new session; the boundary flag's
    * running sum uses the default RANGE frame, so events tied on the
    * timestamp always share a session regardless of their order among
    * peers — both engines agree without a tiebreak column. One row per
    * (user, session).
    *
    * Plan shape: the ordered sessionization window and the unordered
    * per-(user, session) step windows share the ONE user-key exchange
    * (the session windows' partition key is a superset); the whole
    * thing stays a single shuffle like [[stepTimes]], plus the
    * per-user sort the sessionization inherently needs. */
  def sessionStepTimes(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, steps: Seq[String],
                       sessionGapSeconds: Long,
                       maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(sessionGapSeconds > 0, "sessionGapSeconds must be positive")
    require(maxGapSeconds.forall(_ > 0), "maxGapSeconds must be positive")
    val wOrd = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val boundary = when(
      unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(wOrd)) >
        sessionGapSeconds * 1000000L, 1L).otherwise(0L)
    val sess = events.select(col(userCol), col(typeCol), col(tsCol))
      .withColumn("__nb", boundary)
      .withColumn("__sess", sum(col("__nb")).over(wOrd))
      .drop("__nb")
    val w = Window.partitionBy(col(userCol), col("__sess"))
    val withSteps = stackTimes(sess, w, typeCol, tsCol, steps, maxGapSeconds)
    val stepAggs = steps.indices.map(i => first(col(s"__t$i")).as(s"__t$i"))
    withSteps.groupBy(col(userCol), col("__sess"))
      .agg(stepAggs.head, stepAggs.tail: _*)
  }

  /** The funnel report over SESSIONS: [[funnelCounts]]'s shape where
    * `users` counts (user, session) pairs that reached each step in
    * order within one session. */
  def sessionFunnelCounts(events: DataFrame, userCol: String, typeCol: String,
                          tsCol: String, steps: Seq[String],
                          sessionGapSeconds: Long,
                          maxGapSeconds: Option[Long] = None): DataFrame =
    countsFromStepTimes(
      sessionStepTimes(events, userCol, typeCol, tsCol, steps,
        sessionGapSeconds, maxGapSeconds), steps)

  /** [[stepTimes]]'s semantics folded locally over ONE user's
    * `(stepIndex, epoch-micros)` events — the kernel
    * [[graft.streaming.StreamIngest.funnelStream]] keeps in per-user
    * state. Event ORDER is irrelevant (exactly like the stacked
    * min-when windows, which aggregate without an ORDER BY): step i's
    * time is the min event time strictly after step i-1's completion
    * (and within `maxGapMicros` of it when given), computed step by
    * step. Kept in graft.analysis so the batch and streaming forms
    * share one definition of the funnel semantics. */
  private[graft] def foldStepTimes(events: Seq[(Int, Long)], nSteps: Int,
                                   maxGapMicros: Option[Long]): Array[Option[Long]] = {
    val times = Array.fill[Option[Long]](nSteps)(None)
    var i = 0
    var blocked = false
    while (i < nSteps && !blocked) {
      val prev = if (i == 0) None else times(i - 1)
      var best = Long.MaxValue
      events.foreach { case (si, t) =>
        if (si == i && t < best &&
            prev.forall(p => t > p && maxGapMicros.forall(g => t <= p + g)))
          best = t
      }
      if (best != Long.MaxValue) times(i) = Some(best) else blocked = true
      i += 1
    }
    times
  }

  /** The report tail of [[funnelCounts]] over an ALREADY-computed
    * step-times frame (columns `__t0 … __t{n-1}`, one row per user;
    * null = step not reached) — shared by the batch form and the
    * drained-stream report. One global aggregate of #steps
    * conditional counts, conversions as plain column arithmetic on
    * that row, unpivoted window-free. */
  def countsFromStepTimes(st: DataFrame, steps: Seq[String]): DataFrame = {
    val counted = st.agg(
      count(when(col("__t0").isNotNull, lit(1))).as("__c0"),
      steps.indices.tail.map(i =>
        count(when(col(s"__t$i").isNotNull, lit(1))).as(s"__c$i")): _*)
    // every step count sits in the ONE aggregated row, so the per-step
    // conversions are plain column arithmetic on that row — computed
    // BEFORE the unpivot, which keeps the report window-free (no
    // single-partition Window node for the sweep to flag). The unpivot
    // is an explode over an array of per-step structs built from
    // Column expressions: step names are caller data and pass through
    // lit(), never spliced into a SQL string (a quote in a step name
    // must stay a quote, not break — or inject into — a parser).
    def conv(num: Int, den: Int): org.apache.spark.sql.Column =
      when(col(s"__c$den") === 0, lit(null).cast("double"))
        .otherwise(round(col(s"__c$num").cast("double") / col(s"__c$den"), 6))
    counted
      .select(explode(array(steps.zipWithIndex.map { case (s, i) =>
        struct(lit(i.toLong).as("step_idx"), lit(s).as("step"),
          col(s"__c$i").as("users"), conv(i, 0).as("conv_from_first"),
          (if (i == 0) lit(1.0) else conv(i, i - 1)).as("conv_from_prev"))
      }: _*)).as("__r"))
      .select(col("__r.*"))
  }

  /** The funnel report: one row per step with the user count that
    * reached it in order and the conversion rates (vs the first step
    * and vs the previous step, round-6 by the project float contract;
    * a zero-user upstream step yields null conversions rather than a
    * division artifact). The per-step counts reduce to ONE aggregated
    * row (conditional counts over [[stepTimes]]), unpivoted — so after
    * the funnel's single user-key shuffle the report itself is a
    * global aggregate of #steps longs. */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String],
                   maxGapSeconds: Option[Long] = None): DataFrame =
    countsFromStepTimes(
      stepTimes(events, userCol, typeCol, tsCol, steps, maxGapSeconds), steps)

  /** Session-level engagement rollup — the report card of the
    * sessionization the per-session funnel and `events_sessions`
    * share: total sessions, BOUNCES (single-event sessions) with the
    * bounce rate, mean events per session, and the exact interpolated
    * median session duration in seconds. Sessions derive exactly like
    * [[sessionStepTimes]] (inactivity gap > `sessionGapSeconds`
    * starts a new one; the boundary flag's RANGE-frame running sum
    * keeps timestamp ties in one session on every engine). Durations
    * compute on exact epoch micros and divide by 1e6 once (the same
    * IEEE division both engines run); rates/means round 6.
    *
    * Scale shape: the one user-key exchange the sessionization needs,
    * a (user, session)-keyed reduce (state = 3 longs per session),
    * then a global aggregate + exact percentile over session rows —
    * bounded by session count, not event count. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   sessionGapSeconds: Long): DataFrame = {
    require(sessionGapSeconds > 0, "sessionGapSeconds must be positive")
    val wOrd = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val boundary = when(
      unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(wOrd)) >
        sessionGapSeconds * 1000000L, 1L).otherwise(0L)
    val sessions = events.select(col(userCol), col(tsCol))
      .withColumn("__nb", boundary)
      .withColumn("__sess", sum(col("__nb")).over(wOrd))
      .groupBy(col(userCol), col("__sess"))
      .agg(count(lit(1)).as("__n"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol)))).as("__durus"))
    statsFromSessionRows(
      sessions.select(col("__n").as("n_events"), col("__durus").as("dur_us")))
  }

  /** The [[sessionStats]] report tail over MATERIALIZED session rows
    * `(n_events, dur_us)` — factored so the drained streaming twin
    * ([[graft.streaming.StreamIngest.sessionStream]]) and the batch
    * windows aggregate through one definition. */
  def statsFromSessionRows(sessions: DataFrame): DataFrame =
    sessions.agg(
      count(lit(1)).as("n_sessions"),
      count(when(col("n_events") === 1L, lit(1))).as("n_bounce"),
      round(count(when(col("n_events") === 1L, lit(1))).cast("double") /
        count(lit(1)), 6).as("bounce_rate"),
      round(sum(col("n_events")).cast("double") / count(lit(1)), 6).as("avg_events"),
      round(expr("percentile(dur_us / 1e6, 0.5D)"), 6).as("p50_duration_secs"))

  /** [[sessionStats]]'s gap sessionization folded locally over ONE
    * user's event-time MULTISET (micros → occurrence count) — the
    * kernel [[graft.streaming.StreamIngest.sessionStream]] keeps in
    * per-key state. ORDER-FREE by construction: the multiset sorts
    * before the walk, so any delivery order folds to the same session
    * list — and a LATE event landing inside a gap merges the two
    * sessions it separated, exactly as the batch windows would have.
    * Duplicate timestamps are distinct events in the same session
    * (count(*) semantics, the batch tie behavior). Returns
    * `(n_events, duration_us)` per session, ascending by start. */
  private[graft] def foldSessions(times: Map[Long, Long],
                                  gapUs: Long): List[(Long, Long)] = {
    val ts = times.keys.toSeq.sorted
    if (ts.isEmpty) Nil
    else {
      var out = List.empty[(Long, Long)]
      var sStart = ts.head
      var sLast = ts.head
      var n = times(ts.head)
      ts.tail.foreach { t =>
        if (t - sLast > gapUs) {
          out = (n, sLast - sStart) :: out
          sStart = t
          n = 0L
        }
        n += times(t)
        sLast = t
      }
      ((n, sLast - sStart) :: out).reverse
    }
  }

  /** A/B funnel experiment readout — the two-proportion z-test between
    * hash-assigned variants: users split 50/50 by the deterministic
    * [[Sampling.splitAssign]] cut (stable under corpus growth, no
    * coordination — the property an experimentation system actually
    * needs from its bucketing), conversion = reached the LAST step of
    * the ordered funnel among users who entered the FIRST, and
    *
    *   z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)),  p̂ pooled.
    *
    * |z| ≳ 1.96 is the conventional 95 % line. Counts are exact longs;
    * the float chain is a fixed IEEE sequence (round-6 outputs).
    * Degenerate readouts guard explicitly — a variant with no
    * entrants has no rate, and a pooled rate of exactly 0 or 1 has
    * zero variance: both yield null rather than a division artifact
    * (under ANSI, even a DOUBLE divide-by-zero is an error, not an
    * Infinity). Pass `maxGapSeconds` to time-box conversion (an
    * unbounded lifetime funnel over long-lived users saturates both
    * arms at p = 1 and measures nothing).
    *
    * Scale shape: the funnel's single user-key shuffle ([[stepTimes]]),
    * variant label as stateless per-row hash arithmetic, and ONE
    * conditional-count aggregate row — the test statistic never
    * shuffles more than the funnel it measures. */
  def abTestFunnel(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String],
                   maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, "an experiment funnel needs entry and conversion steps")
    val st = stepTimes(events, userCol, typeCol, tsCol, steps, maxGapSeconds)
      .withColumn("__v", Sampling.splitAssign(col(userCol),
        Seq("a" -> 0.5, "b" -> 0.5)))
    val last = s"__t${steps.size - 1}"
    def cnt(v: String, c: org.apache.spark.sql.Column) =
      count(when(col("__v") === v && c, lit(1)))
    val agg = st.agg(
      cnt("a", col("__t0").isNotNull).as("n_a"),
      cnt("a", col(last).isNotNull).as("conv_a"),
      cnt("b", col("__t0").isNotNull).as("n_b"),
      cnt("b", col(last).isNotNull).as("conv_b"))
    val pa = agg("conv_a").cast("double") / agg("n_a")
    val pb = agg("conv_b").cast("double") / agg("n_b")
    val x = agg("conv_a") + agg("conv_b")
    val n = agg("n_a") + agg("n_b")
    val pp = x.cast("double") / n
    val z = (pa - pb) /
      sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / agg("n_a") + lit(1.0) / agg("n_b")))
    def ifEntrants(v: String, c: org.apache.spark.sql.Column) =
      when(agg(s"n_$v") === 0L, lit(null).cast("double")).otherwise(c)
    agg.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      ifEntrants("a", round(pa, 6)).as("p_a"),
      ifEntrants("b", round(pb, 6)).as("p_b"),
      when(agg("n_a") === 0L || agg("n_b") === 0L ||
          x === 0L || x === n, lit(null).cast("double"))
        .otherwise(round(z, 6)).as("z"))
  }

  /** CUPED variance-reduced A/B readout (Deng et al. 2013,
    * "Improving the Sensitivity of Online Controlled Experiments") —
    * the activity-metric companion of [[abTestFunnel]]: the
    * experiment metric is each user's POST-cutoff event count, the
    * covariate their PRE-cutoff count, and the adjusted metric
    * `y − θ(x − x̄)` removes the variance the pre-period already
    * explains (θ = cov(x,y)/var(x), pooled over both arms — using a
    * pre-experiment covariate keeps the adjustment unbiased). The
    * report derives every mean from ARM-LEVEL integer sums —
    * `adj_mean = ȳ_arm − θ(x̄_arm − x̄)` — so no per-row float ever
    * aggregates: all moments (Σx, Σy, Σx², Σxy, Σy², per-arm Σ) are
    * exact longs and the float chain is a fixed IEEE sequence
    * (round-6 outputs; the z-test precedent). `var_reduction` is the
    * theoretical fraction removed, ρ² = cov²/(var·var). Degenerate
    * guards: zero pre-period variance → θ = 0 (no adjustment — CUPED
    * degrades to the plain diff, well-defined); an empty arm → null
    * means.
    *
    * Scale shape: one user-keyed conditional-count reduce (map-side
    * combined), variant label as stateless hash arithmetic
    * ([[Sampling.splitAssign]] — the bucketing stability contract),
    * and ONE aggregate row. Long moments bound: per-user counts up to
    * ~2³¹ and ≤ ~2³¹ users stay exact; beyond that widen the moment
    * sums to DECIMAL(38,0) (still algebraic, still portable). */
  def cupedAbTest(events: DataFrame, userCol: String, tsCol: String,
                  cutoff: String): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    val perUser = events.groupBy(col(userCol))
      .agg(count(when(col(tsCol) < cut, lit(1))).as("__x"),
        count(when(col(tsCol) >= cut, lit(1))).as("__y"))
      .withColumn("__v", Sampling.splitAssign(col(userCol),
        Seq("a" -> 0.5, "b" -> 0.5)))
    def armSum(v: String, c: Column) =
      sum(when(col("__v") === v, c).otherwise(lit(0L)))
    val agg = perUser.agg(
      count(lit(1)).as("c"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
      sum(col("__x") * col("__x")).as("sxx"),
      sum(col("__x") * col("__y")).as("sxy"),
      sum(col("__y") * col("__y")).as("syy"),
      count(when(col("__v") === "a", lit(1))).as("n_a"),
      armSum("a", col("__x")).as("sx_a"), armSum("a", col("__y")).as("sy_a"),
      count(when(col("__v") === "b", lit(1))).as("n_b"),
      armSum("b", col("__x")).as("sx_b"), armSum("b", col("__y")).as("sy_b"))
    // exact integer central-moment numerators (×c² scaling cancels in
    // every ratio below)
    val covN = agg("c") * agg("sxy") - agg("sx") * agg("sy")
    val varXN = agg("c") * agg("sxx") - agg("sx") * agg("sx")
    val varYN = agg("c") * agg("syy") - agg("sy") * agg("sy")
    val theta = when(varXN === 0L, lit(0.0))
      .otherwise(covN.cast("double") / varXN.cast("double"))
    val meanX = agg("sx").cast("double") / agg("c")
    def ifArm(n: Column, c: Column) =
      when(n === 0L, lit(null).cast("double")).otherwise(round(c, 6))
    val meanA = agg("sy_a").cast("double") / agg("n_a")
    val meanB = agg("sy_b").cast("double") / agg("n_b")
    val adjA = meanA - theta * (agg("sx_a").cast("double") / agg("n_a") - meanX)
    val adjB = meanB - theta * (agg("sx_b").cast("double") / agg("n_b") - meanX)
    val vr = when(varXN === 0L || varYN === 0L, lit(0.0))
      .otherwise(covN.cast("double") * covN.cast("double") /
        (varXN.cast("double") * varYN.cast("double")))
    agg.select(col("n_a"), col("n_b"),
      ifArm(agg("n_a"), meanA).as("mean_a"),
      ifArm(agg("n_b"), meanB).as("mean_b"),
      round(theta, 6).as("theta"),
      ifArm(agg("n_a"), adjA).as("adj_mean_a"),
      ifArm(agg("n_b"), adjB).as("adj_mean_b"),
      when(agg("n_a") === 0L || agg("n_b") === 0L,
        lit(null).cast("double"))
        .otherwise(round(adjA - adjB, 6)).as("adj_diff"),
      round(vr, 6).as("var_reduction"))
  }

  /** Hold-out accuracy of the [[eventTransitions]] Markov model — the
    * eval gate for the transition matrix: each user's LAST transition
    * is held out, the matrix trains on the REST, and the model
    * predicts the held-out destination as the argmax count for its
    * source (ties to the destination ascending — rank determinism).
    * One row: `(n_eval, n_correct, accuracy)`; a held-out source
    * never seen in training predicts nothing and scores incorrect
    * (the honest convention — the model genuinely has no answer).
    *
    * Scale shape: one user-key window builds ordered transition
    * pairs and marks each user's last; training counts and the
    * per-source argmax are |types|²-bounded reduces; the eval join is
    * |types|-keyed over one row per user. */
  def markovAccuracy(events: DataFrame, userCol: String, typeCol: String,
                     tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("__dst", lead(col(typeCol), 1).over(w))
      .filter(col("__dst").isNotNull)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(userCol))
          .orderBy(col(tsCol).desc, col(idCol).desc)))
      .select(col(userCol), col(typeCol).as("src"), col("__dst").as("dst"),
        (col("__rn") === 1).as("__held"))
    val train = pairs.filter(!col("__held"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    val wBest = Window.partitionBy(col("src"))
      .orderBy(col("n").desc, col("dst").asc)
    val pred = train.withColumn("__r", row_number().over(wBest))
      .filter(col("__r") === 1)
      .select(col("src"), col("dst").as("__pred"))
    val eval = pairs.filter(col("__held"))
      .join(broadcast(pred), Seq("src"), "left")
    eval.agg(
      count(lit(1)).as("n_eval"),
      count(when(col("dst") === col("__pred"), lit(1))).as("n_correct"),
      round(count(when(col("dst") === col("__pred"), lit(1))).cast("double") /
        count(lit(1)), 6).as("accuracy"))
  }

  /** First-order event-transition matrix — for every consecutive
    * `(src → dst)` event pair inside a user's (ts, id)-ordered stream:
    * the count and the conditional probability
    * `p(dst | src) = n(src, dst) / Σ_d n(src, d)`, rounded to 6. This
    * is the Markov-chain view of [[topEventPaths]] at n = 2 — the
    * normalized form a product analyst reads as "after a search, 38 %
    * of next actions are a click" and a simulation/anomaly pipeline
    * uses as the baseline transition model.
    *
    * Plan shape: ONE user-keyed window (`lead` — constant per-row
    * state, no per-user array), then a `(src, dst)` reduce whose keys
    * are bounded by |event types|², and a broadcast-sized src-total
    * join off that bounded frame. The last event of each user has no
    * successor and drops out — transitions never cross users. */
  def eventTransitions(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val counts = events
      .withColumn("__dst", lead(col(typeCol), 1).over(w))
      .filter(col("__dst").isNotNull)
      .groupBy(col(typeCol).as("src"), col("__dst").as("dst"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("src")).agg(sum(col("n")).as("__tn"))
    counts.join(totals, Seq("src"))
      .select(col("src"), col("dst"), col("n"),
        round(col("n") / col("__tn"), 6).as("p"))
  }

  /** PageRank over the [[eventTransitions]] graph — the stationary
    * importance of each event type under the random-surfer model
    * (Brin & Page 1998): with probability `alpha` the surfer follows
    * an observed transition (weighted by its count), otherwise
    * teleports uniformly; dangling nodes (types never seen as a
    * source) redistribute their mass uniformly, the standard
    * treatment. Unlike raw transition counts, the rank is RECURSIVE —
    * an event type fed by other important types outranks one fed the
    * same number of times from noise.
    *
    * Scale/determinism shape: the corpus-scale work is the ONE
    * user-keyed lead window + |types|²-bounded reduce of
    * [[eventTransitions]]; the matrix it leaves is MODEL state (the
    * centroid-collect precedent), so the power iteration folds
    * driver-side in a FIXED order — per-destination contributions in
    * UTF-8-ascending source order, dangling mass in node order, init
    * 0.0 — making every iteration a replayable IEEE sequence (the
    * oracle unrolls the same folds as ordered `list_reduce` CTEs).
    * For graphs whose node set is NOT model-state bounded (user-user
    * graphs), the same update runs distributed — rank frame joined to
    * edges, per-dst ordered fold — one keyed join + reduce per
    * iteration; the type graph never needs it. Round-6 on output
    * only. */
  def transitionPageRank(events: DataFrame, userCol: String, typeCol: String,
                         tsCol: String, idCol: String,
                         alpha: Double = 0.85, iters: Int = 5): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(alpha > 0.0 && alpha < 1.0, "alpha in (0,1)")
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val edges = events
      .withColumn("__dst", lead(col(typeCol), 1).over(w))
      .filter(col("__dst").isNotNull)
      .groupBy(col(typeCol).as("src"), col("__dst").as("dst"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    pageRankLocal(edges, alpha, iters)
      .toDF("event_type", "rank")
      .select(col("event_type"), round(col("rank"), 6).as("rank"))
  }

  /** Unsigned-UTF-8-byte string order — the binary string order both
    * engines sort by (Java's `compareTo` diverges on supplementary
    * characters). */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The fixed-order power iteration behind [[transitionPageRank]]:
    * edge weights and out-degrees are exact longs, every float fold
    * runs in a deterministic order (see caller doc). */
  private[graft] def pageRankLocal(edges: Seq[(String, String, Long)],
                                   alpha: Double,
                                   iters: Int): Seq[(String, Double)] = {
    val ord = Ordering.fromLessThan(utf8Lt)
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted(ord)
    val n = nodes.size
    if (n == 0) return Seq.empty
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val incoming = edges.groupBy(_._2).map { case (d, es) =>
      d -> es.map(e => (e._1, e._3)).sortBy(_._1)(ord)
    }
    val dangling = nodes.filterNot(out.contains)
    var rank: Map[String, Double] = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val dang = dangling.foldLeft(0.0)((acc, d) => acc + rank(d))
      rank = nodes.map { d =>
        val inc = incoming.getOrElse(d, Nil).foldLeft(0.0) {
          case (acc, (s, wgt)) => acc + rank(s) * wgt / out(s)
        }
        d -> ((1.0 - alpha) / n + alpha * (inc + dang / n))
      }.toMap
    }
    nodes.map(d => (d, rank(d)))
  }

  /** Per-user path surprisal under the [[eventTransitions]] model —
    * the anomaly score over behavioral streams: each user's observed
    * transitions score `−ln p(dst | src)` against the corpus-wide
    * matrix, averaged per user; the top-k most-surprising users (score
    * DESC, user ASC) surface the sessions whose flow least resembles
    * everyone else's (bot traffic, broken funnels, scraping). The
    * model and the scoring both derive from the SAME event frame, so
    * every observed pair exists in the matrix — p is never 0 and the
    * log never sees it. p is the matrix's round-6 value (rank
    * determinism), the mean rounds once more at 6.
    *
    * Scale shape: the [[eventTransitions]] plan plus one broadcast-
    * sized join of the |types|²-bounded matrix back onto the pair
    * stream and a user-keyed mean; top-k is a TakeOrdered over
    * user-level rows, never a global sort of events. */
  def pathSurprisal(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val prs = events
      .withColumn("__dst", lead(col(typeCol), 1).over(w))
      .filter(col("__dst").isNotNull)
      .select(col(userCol), col(typeCol).as("src"), col("__dst").as("dst"))
    val model = eventTransitions(events, userCol, typeCol, tsCol, idCol)
      .select(col("src"), col("dst"), col("p"))
    prs.join(broadcast(model), Seq("src", "dst"))
      .groupBy(col(userCol)).agg(
        count(lit(1)).as("n_trans"),
        round(avg(-log(col("p"))), 6).as("surprisal"))
      .orderBy(col("surprisal").desc, col(userCol).asc)
      .limit(k)
  }

  /** First-touch / last-touch conversion attribution — "which event
    * type gets credit for the purchase": per user, conversion time is
    * the FIRST `convType` event; the credited touches are the user's
    * events STRICTLY before it (an event tied with the conversion
    * timestamp is not a cause). First-touch credits the earliest such
    * event's type, last-touch the latest ((ts, id) total order both
    * ways); the report counts conversions per (model, event_type).
    * Users who convert with no prior event appear in neither model —
    * there is nothing to credit.
    *
    * Plan shape: one user-keyed aggregate for the conversion times,
    * one keyed join back (never broadcast-dependent — both sides key
    * on the user), and two rank windows that REUSE the join's user
    * partitioning (same key, different sort order — one exchange, two
    * sorts); the report reduces over ≤ 2 rows per converting user. */
  def touchAttribution(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, idCol: String, convType: String): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__ct"))
    val pre = events.join(conv, Seq(userCol))
      .filter(col(tsCol) < col("__ct"))
      .select(col(userCol), col(typeCol), col(tsCol), col(idCol))
    def pick(ord: Seq[Column], model: String): DataFrame =
      pre.withColumn("__rn", row_number().over(
          Window.partitionBy(col(userCol)).orderBy(ord: _*)))
        .filter(col("__rn") === 1)
        .select(lit(model).as("model"), col(typeCol))
    pick(Seq(col(tsCol).asc, col(idCol).asc), "first_touch")
      .unionByName(pick(Seq(col(tsCol).desc, col(idCol).desc), "last_touch"))
      .groupBy(col("model"), col(typeCol))
      .agg(count(lit(1)).as("n"))
  }

  /** PEAK CONCURRENCY — the load gauge: the maximum number of
    * simultaneously-open sessions (inclusive `[start, end]` intervals
    * from the same gap sessionization [[sessionStats]] pins), by
    * sweep-line: +1 at each session start, −1 at each end, peak of the
    * running sum. At equal instants starts order before ends, so
    * touching sessions count as overlapping (the inclusive
    * convention).
    *
    * A naive sweep is one global ordered prefix — a SinglePartition
    * sort. This is the HIERARCHICAL form (the seq-pack two-phase
    * lesson applied to prefix-max): within-hour running sums under an
    * hour-keyed window, per-hour totals cumulated over the BOUNDED
    * hour grid (the one small global window, ks_value_drift class),
    * peak = max over hours of (hour offset + within-hour peak). One
    * user-keyed sessionization shuffle + one hour-keyed shuffle.
    *
    * @return one row `(n_sessions, max_concurrent)`
    */
  def maxConcurrentSessions(events: DataFrame, userCol: String,
                            tsCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val wOrd = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val boundary = when(
      unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(wOrd)) >
        gapSeconds * 1000000L, 1L).otherwise(0L)
    val sessions = events.select(col(userCol), col(tsCol))
      .withColumn("__nb", boundary)
      .withColumn("__sess", sum(col("__nb")).over(wOrd))
      .groupBy(col(userCol), col("__sess"))
      .agg(unix_micros(min(col(tsCol))).as("__s"),
        unix_micros(max(col(tsCol))).as("__e"))
    val pts = sessions.select(col("__s").as("t"), lit(1L).as("d"))
      .unionByName(sessions.select(col("__e").as("t"), lit(-1L).as("d")))
      .withColumn("__hour", floor(col("t") / lit(3600000000L)))
    val wIn = Window.partitionBy(col("__hour"))
      .orderBy(col("t").asc, col("d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inHour = pts.withColumn("__run", sum(col("d")).over(wIn))
      .groupBy(col("__hour"))
      .agg(sum(col("d")).as("__tot"), max(col("__run")).as("__peak"))
    // offsets over the bounded hour grid: everything BEFORE this hour
    val wH = Window.orderBy(col("__hour"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val peaks = inHour
      .withColumn("__off", coalesce(sum(col("__tot")).over(wH), lit(0L)))
      .select((col("__off") + col("__peak")).as("__p"))
    val n = sessions.agg(count(lit(1)).as("n_sessions"))
    n.crossJoin(peaks.agg(max(col("__p")).as("max_concurrent")))
  }

  /** LINEAR (even-credit) attribution — the multi-touch companion of
    * [[touchAttribution]]'s first/last picks: every event strictly
    * before the user's first conversion shares the user's one unit of
    * credit equally (credit per touch = 1/n_touches), so channels that
    * assist mid-journey are visible where single-touch models erase
    * them. Per-user fractions are exact small-denominator rationals;
    * they accumulate as DECIMAL(38,12) addends (order-free, exact), so
    * the per-type totals replay bit-for-bit. Same plan skeleton as the
    * single-touch models: one keyed conversion join, two keyed
    * reduces. */
  def linearAttribution(events: DataFrame, userCol: String, typeCol: String,
                        tsCol: String, convType: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val conv = events.filter(col(typeCol) === convType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__ct"))
    val pre = events.join(conv, Seq(userCol))
      .filter(col(tsCol) < col("__ct"))
      .select(col(userCol), col(typeCol))
    val perUser = pre.groupBy(col(userCol)).agg(count(lit(1)).as("__n"))
    pre.groupBy(col(userCol), col(typeCol)).agg(count(lit(1)).as("__c"))
      .join(perUser, Seq(userCol))
      .select(col(typeCol),
        (col("__c").cast("double") / col("__n").cast("double"))
          .cast(DecimalType(38, 12)).as("__credit"))
      .groupBy(col(typeCol))
      .agg(round(sum(col("__credit")).cast("double"), 6).as("credit"))
  }

  /** Top event paths: the most common length-`n` ordered event-type
    * sequences across users ("what do people actually do?"). Per user,
    * events sort by `(ts, idCol)` (the project total order) into one
    * sequence; its sliding n-grams count corpus-wide; top-k by
    * `(count DESC, path ASC)` with the path rendered `a>b>c`.
    *
    * Plan shape: ONE corpus shuffle to the user key (map-side partial
    * `collect_list`), per-user state bounded by the user's event count
    * (the same bound every sessionization carries — a pathological
    * single-user log concentrates on one executor; cap upstream if
    * that's real), then an n-gram explode into a `(path)` reduce whose
    * keys are bounded by |event types|ⁿ, and a global top-k over that
    * bounded set. */
  def topEventPaths(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, idCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 2 && k >= 1, "need n >= 2, k >= 1")
    val seqs = events
      .select(col(userCol),
        struct(col(tsCol), col(idCol), col(typeCol).as("et")).as("e"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(transform(col("es"), e => e.getField("et")).as("seq"))
    seqs
      .filter(size(col("seq")) >= n)
      .select(explode(transform(
        sequence(lit(0), size(col("seq")) - n),
        i => concat_ws(">", slice(col("seq"), i + lit(1), lit(n))))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path").asc)
      .limit(k)
  }

  /** Retention cohorts: users grouped by their first-activity day, and
    * for each `(cohort_day, offset_days)` the count still active that
    * many days later, with the retention fraction of the cohort.
    *
    * Plan shape: ONE corpus-sized shuffle — a per-user aggregate whose
    * map side already dedups days (`collect_set` partials combine
    * per-partition), carrying `(min day, distinct days)`; per-user
    * state is bounded by the calendar span (a user active daily for 30
    * years holds ~11k day entries), not by event count. Everything
    * after explodes those bounded sets and reduces on
    * `(cohort_day, offset)` — at most calendar² keys — with cohort
    * sizes fanned out from the offset-0 rows by a cohort-keyed window
    * over that bounded aggregate (see the inline note: a separate
    * size branch would rescan the corpus). */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame =
    cohortsFromUserDays(events
      .select(col(userCol), date_trunc("day", col(tsCol)).as("__day"))
      .groupBy(col(userCol))
      .agg(min(col("__day")).as("__cohort"),
        collect_set(col("__day")).as("__days")))

  /** Kaplan-Meier survival curve of TIME-TO-CONVERT — "how long after
    * `entryStep` does `convStep` happen, accounting for users who
    * haven't converted YET": the right-censoring-aware answer the
    * naive mean-of-converters overstates (fast converters are
    * over-represented among the observed). Entrants are users with an
    * `entryStep` event (first one = their clock start, the
    * [[stepTimes]] kernel); converters' duration is first in-order
    * `convStep` minus that; non-converters are CENSORED at the study
    * end (the frame's max timestamp — observation simply stopped).
    * Durations bucket into `bucketSeconds` integer buckets (exact
    * micros integer division — O(span/bucket) grid rows regardless of
    * corpus size, the histogram-bounding convention), and for each
    * bucket with ≥1 conversion the estimator reports
    * `S(t) = Π_{t_j ≤ t} (1 − d_j / n_j)` with `n_j` = entrants whose
    * event-or-censor time is ≥ t_j (censored-at-t still at risk at t —
    * the standard "events before censorings" tie convention).
    *
    * Float determinism: each factor is one IEEE divide+subtract and
    * the running product folds in ascending-bucket order on BOTH
    * engines (sorted-struct `aggregate` here, ordered `list_reduce`
    * in the oracle) — a window `exp(sum(ln))` product would not be
    * bit-portable. Round-6 only on the final per-row value.
    *
    * Plan shape: the [[stepTimes]] user-key shuffle, a 1-row study-end
    * broadcast, a bucket-keyed reduce to the O(span/bucket) grid, and
    * the at-risk/product tail over GRID rows only (the unpartitioned
    * cumulative window + sorted fold are bounded by the grid — the
    * `ks_value_drift` WinScan class, never data rows). */
  def survivalCurve(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, entryStep: String, convStep: String,
                    bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val st = stepTimes(events, userCol, typeCol, tsCol,
      Seq(entryStep, convStep))
    val obsEnd = events.agg(max(col(tsCol)).as("__end"))
    val timed = st.filter(col("__t0").isNotNull)
      .crossJoin(broadcast(obsEnd))
      .withColumn("__um",
        unix_micros(coalesce(col("__t1"), col("__end"))) -
          unix_micros(col("__t0")))
      // exact integer bucket (non-negative, so DIV ≡ floor division)
      .withColumn("t_bucket", expr(s"__um DIV ${bucketSeconds * 1000000L}"))
      .withColumn("__ev", col("__t1").isNotNull.cast("long"))
    val grid = timed.groupBy(col("t_bucket"))
      .agg(sum(col("__ev")).as("n_event"),
        sum(lit(1L) - col("__ev")).as("__c"))
    // cumulative "left the risk set before this bucket" — integer
    // window over grid rows (bounded, see Scaladoc)
    val wCum = Window.orderBy(col("t_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risky = grid
      .withColumn("__gone",
        coalesce(sum(col("n_event") + col("__c")).over(wCum), lit(0L)))
      .crossJoin(broadcast(
        grid.agg(sum(col("n_event") + col("__c")).as("__N"))))
      .withColumn("n_risk", col("__N") - col("__gone"))
    val ev = risky.filter(col("n_event") > 0)
      .select(col("t_bucket"), col("n_risk"), col("n_event"))
    // event-bucket factors as a sorted in-row list: the product is a
    // per-row ordered fold, identical IEEE sequence in both engines
    val factors = ev.agg(array_sort(collect_list(struct(
      col("t_bucket").as("t"),
      (lit(1.0) - col("n_event").cast("double") /
        col("n_risk").cast("double")).as("f")))).as("__fl"))
    ev.crossJoin(broadcast(factors))
      .select(col("t_bucket"), col("n_risk"), col("n_event"),
        round(aggregate(
          filter(col("__fl"), x => x.getField("t") <= col("t_bucket")),
          lit(1.0), (acc, x) => acc * x.getField("f")), 6).as("survival"))
  }

  /** The report tail of [[retentionCohorts]] over an ALREADY-computed
    * per-user frame (`__cohort` = first-activity day, `__days` =
    * distinct active days — date or timestamp typed), one row per
    * user — shared by the batch form and the drained-stream report
    * ([[graft.streaming.StreamIngest.retentionStream]]). */
  def cohortsFromUserDays(perUser: DataFrame): DataFrame = {
    val active = perUser
      .select(col("__cohort"), explode(col("__days")).as("__day"))
      .groupBy(col("__cohort").as("__cohort_day"),
        datediff(col("__day"), col("__cohort")).cast("long").as("offset_days"))
      .agg(count(lit(1)).as("active_users")) // rows are (user, day)-unique
    // cohort size ≡ the offset-0 row (a user's first day IS an active
    // day), fanned out by a cohort-keyed window over the aggregate's
    // calendar²-bounded output — a separate per-user count branch
    // would rescan the corpus (no exchange reuse: the pushed offset-0
    // filter makes the subtrees differ), all for a value the frame
    // already holds
    val wC = Window.partitionBy(col("__cohort_day"))
    active
      .withColumn("cohort_size",
        max(when(col("offset_days") === 0, col("active_users"))).over(wC))
      .select(
        date_format(col("__cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("offset_days"), col("active_users"), col("cohort_size"),
        round(col("active_users").cast("double") / col("cohort_size"), 6)
          .as("retention"))
  }
}
