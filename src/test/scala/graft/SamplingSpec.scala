package graft

import org.apache.spark.sql.functions._

import graft.analysis.Sampling

class SamplingSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("consistent sample: deterministic, near the target rate, fractions nest") {
    def ids(f: Double): Set[Long] =
      Sampling.consistentSample(docs, "doc_id", f)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val s5 = ids(0.05); val s20 = ids(0.2); val s50 = ids(0.5)
    assert(s5.subsetOf(s20) && s20.subsetOf(s50)) // nesting
    assert(ids(0.2) == s20)                       // rerun-identical
    val n = docs.count().toDouble
    assert(math.abs(s20.size / n - 0.2) < 0.08, s"rate ${s20.size / n}")
    assert(ids(0.0).isEmpty && ids(1.0).size == n.toLong)
  }

  test("fixedSizeSample: exact size, rerun-identical, nested (smaller n is a prefix)") {
    def ids(n: Int): Set[Long] =
      Sampling.fixedSizeSample(docs, "doc_id", n)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val s40 = ids(40); val s100 = ids(100)
    assert(s40.size == 40 && s100.size == 100)
    assert(s40.subsetOf(s100), "bucket-order prefix property broken")
    assert(ids(100) == s100, "must be rerun-identical")
    // the sample set is a pure function of ids — partitioning-invariant
    val repart = Sampling.fixedSizeSample(docs.repartition(16), "doc_id", 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repart == s100)
  }

  test("groupFixedSizeSample: exact n per stratum, ≡ the window spec, prefilter-exact") {
    def asMap(df: org.apache.spark.sql.DataFrame): Map[String, Set[Long]] =
      df.collect().groupBy(_.getAs[String]("lang"))
        .map { case (l, rs) => l -> rs.map(_.getAs[Long]("doc_id")).toSet }
    val d = docs.select(col("doc_id"), col("lang"))
    val prod = asMap(Sampling.groupFixedSizeSample(d, "doc_id", "lang", 5))
    val specForm = asMap(Sampling.groupFixedSizeSampleWindow(d, "doc_id", "lang", 5))
    assert(prod == specForm, "prefiltered path must equal the window spec exactly")
    val totals = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    prod.foreach { case (l, ids) =>
      assert(ids.size == math.min(5L, totals(l)), s"$l sample size ${ids.size}") }
    assert(prod.keySet == totals.keySet, "every stratum must be represented")
    // oversample=1.0 makes short strata likely — the fallback keeps it exact
    val tight = asMap(Sampling.groupFixedSizeSample(d, "doc_id", "lang", 5, oversample = 1.0))
    assert(tight == specForm, "fallback path must stay exact")
    // nesting per stratum: n=3 is a prefix of n=5, stratum by stratum
    val smaller = asMap(Sampling.groupFixedSizeSample(d, "doc_id", "lang", 3))
    smaller.foreach { case (l, ids) => assert(ids.subsetOf(prod(l)), s"$l must nest") }
  }

  test("bucket is overflow-free under ANSI for ids up to Long.MaxValue") {
    // Residues >= ~3.47e9 used to overflow the plain Knuth multiply
    // (ANSI ArithmeticException). Pin the split-multiply result against
    // BigInt ground truth across the danger zone and the extremes.
    val ids = Seq(0L, 1L, 3474000000L, (1L << 32) - 1, 1L << 32, 1L << 40,
      Long.MaxValue, -1L, Long.MinValue)
    import spark.implicits._
    val got = ids.toDF("id").repartition(1)
      .select(col("id"), Sampling.bucket(col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val M = BigInt(1) << 32
    for (i <- ids) {
      val want = ((BigInt(i).mod(M)) * BigInt(2654435761L)).mod(M).toLong
      assert(got(i) == want, s"id=$i got=${got(i)} want=$want")
    }
  }

  test("weighted sample: deterministic, weight-proportional, top-k-bounded plan") {
    import spark.implicits._
    // two weight classes: heavy rows (w=50) should dominate a sample
    // over light rows (w=1) roughly in proportion to total weight
    val rows = (0L until 1000L).map(i => (i, if (i % 2 == 0) 50L else 1L))
      .toDF("id", "w")
    val s1 = Sampling.weightedSample(rows, "id", "w", 100)
      .select("id").collect().map(_.getLong(0)).toSeq
    val s2 = Sampling.weightedSample(rows, "id", "w", 100)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "same corpus must yield the same sample")
    val heavy = s1.count(_ % 2 == 0)
    assert(heavy >= 85, s"heavy rows carry ~98% of total weight, got $heavy/100")
    // zero/negative weights are excluded outright
    val withZero = (0L until 10L).map(i => (i, if (i < 5) 0L else 10L)).toDF("id", "w")
    val kept = Sampling.weightedSample(withZero, "id", "w", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == (5L until 10L).toSet)
    // the plan is a bounded top-k, not a global sort
    val plan = Sampling.weightedSample(rows, "id", "w", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("token-budget mix: budgets nest, overshoot bounded by one document") {
    val weighted = docs.select(col("doc_id"), col("lang"),
      graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("weight"))
    def ids(budget: Long): Set[Long] =
      Sampling.tokenBudgetSample(weighted, "doc_id", "weight", "lang",
          Map("en" -> budget), defaultBudget = 0L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val small = ids(500L)
    val big = ids(2000L)
    assert(small.nonEmpty && small.subsetOf(big), "growing a budget must be a superset")
    // the kept token total exceeds the budget by AT MOST the last doc
    val kept = Sampling.tokenBudgetSample(weighted, "doc_id", "weight", "lang",
        Map("en" -> 500L), defaultBudget = 0L)
      .agg(sum(col("weight")).as("t"), max(col("weight")).as("m")).collect().head
    assert(kept.getLong(0) < 500L + kept.getLong(1),
      s"total ${kept.getLong(0)} must be < budget + one doc (${500L + kept.getLong(1)})")
    // deterministic across runs
    assert(ids(500L) == small)
  }

  test("token-budget two-phase prefix sum ≡ the one-window-per-stratum spec") {
    val weighted = docs.select(col("doc_id"), col("lang"),
      graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("weight"))
    val budgets = Map("en" -> 3000L, "de" -> 1000L)
    // tiny rangeBuckets forces real cross-bucket offset stitching even
    // on the 100-doc fixture; 256 exercises many empty buckets
    for (rb <- Seq(4, 256)) {
      val twoPhase = Sampling.tokenBudgetSample(weighted, "doc_id", "weight",
          "lang", budgets, defaultBudget = 500L, rangeBuckets = rb)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val windowed = Sampling.tokenBudgetSampleWindow(weighted, "doc_id",
          "weight", "lang", budgets, defaultBudget = 500L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(twoPhase == windowed, s"rangeBuckets=$rb: " +
        s"only-two-phase=${twoPhase -- windowed}, only-window=${windowed -- twoPhase}")
    }
    // schema parity with the spec: the using-join inside the two-phase
    // path must not reorder the input's columns
    val outCols = Sampling.tokenBudgetSample(weighted, "doc_id", "weight",
      "lang", budgets, defaultBudget = 500L).columns.toSeq
    assert(outCols == weighted.columns.toSeq,
      s"two-phase path reordered columns: $outCols")
  }

  test("token-budget plan: no window partitioned by the stratum alone") {
    // the hot-key guard: every Window in the plan must partition by the
    // hash-range bucket too, or a 100 TB stratum sorts in one task
    val weighted = docs.select(col("doc_id"), col("lang"),
      graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("weight"))
    val plan = Sampling.tokenBudgetSample(weighted, "doc_id", "weight",
        "lang", Map("en" -> 3000L), defaultBudget = 500L)
      .queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty, plan.take(800))
    assert(windowLines.forall(_.contains("__hb")),
      s"window not keyed by hash-range bucket:\n${windowLines.mkString("\n")}")
  }

  test("temperature mix: alpha=1 keeps natural proportions, alpha=0.5 flattens, budgets nest") {
    def kept(alpha: Double, budget: Long): Map[String, Set[Long]] =
      Sampling.temperatureMix(docs, "doc_id", "lang", alpha, budget)
        .select(col("lang"), col("doc_id")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    // alpha = 1: every stratum's rate is exactly budget/N, so the mix
    // degenerates to the plain consistent sample at that fraction —
    // same Knuth cut, same rows (natural proportions survive exactly)
    val nat = kept(1.0, 200L).values.flatten.toSet
    val uniform = Sampling.consistentSample(docs, "doc_id", 200.0 / total)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(nat == uniform, "alpha=1 must equal the uniform consistent sample")
    // alpha = 0.5: the rarest language keeps a HIGHER fraction of
    // itself than the most common one (the flattening)
    val flat = kept(0.5, 200L)
    val rare = counts.minBy(_._2)._1
    val common = counts.maxBy(_._2)._1
    val rRate = flat.getOrElse(rare, Set.empty).size.toDouble / counts(rare)
    val cRate = flat.getOrElse(common, Set.empty).size.toDouble / counts(common)
    assert(rRate > cRate, s"flattening must upsample $rare ($rRate) over $common ($cRate)")
    // expected total near the budget (hash-uniform up to granularity)
    val totalKept = flat.values.map(_.size).sum
    assert(math.abs(totalKept - 200) < 0.25 * 200, s"kept $totalKept of budget 200")
    // budgets nest: rates grow monotonically with the budget
    val small = kept(0.5, 100L)
    small.foreach { case (l, ids) =>
      assert(ids.subsetOf(flat.getOrElse(l, Set.empty)), s"$l must nest") }
    // a budget >= N caps every rate at 1 — the full corpus comes back
    val all = kept(0.5, total.toLong * 10)
    assert(all.values.map(_.size).sum == total.toLong)
  }

  test("stratified sample honors per-stratum rates and the default") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 1.0, "de" -> 0.0), defaultFraction = 0.2)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("en") == total("en"))  // fraction 1.0 keeps everything
    assert(!out.contains("de"))       // fraction 0.0 keeps nothing
    val others = total.keySet -- Set("en", "de")
    val rate = others.toSeq.map(l => out.getOrElse(l, 0L)).sum.toDouble /
      others.toSeq.map(total).sum
    assert(math.abs(rate - 0.2) < 0.1, s"default rate $rate")
  }

  test("epochsPerSource: closed-form allocation, clamp, and alpha=1 proportionality") {
    import spark.implicits._
    // masses: a=100 tokens, b=400 — sqrt weights 10 and 20 → shares 1/3, 2/3
    val docs = Seq(("a", 100L), ("b", 400L)).toDF("src", "toks")
    val out = Sampling.epochsPerSource(docs, "src", col("toks"),
        alpha = 0.5, budget = 900L, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))).toMap
    // a: share round6(1/3) = 0.333333 → floor(0.333333·900) = 299
    // (floor never exceeds the budget), epochs 2.99, cap 200 → capped
    assert(out("a") == ((100L, 299L, 2.99, 200L, 1L)), s"got ${out("a")}")
    // b: share 2/3 → alloc 600, epochs 1.5, under the 800 cap
    assert(out("b") == ((400L, 600L, 1.5, 600L, 0L)), s"got ${out("b")}")
    // alpha = 1 allocates in natural proportion: 100:400 → 180/720
    val nat = Sampling.epochsPerSource(docs, "src", col("toks"),
        alpha = 1.0, budget = 900L, maxEpochs = 10.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(nat == Map("a" -> 180L, "b" -> 720L), s"got $nat")
  }
}
