package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `rand()`-based sampling is nondeterministic across runs, partitions
  * and engines — useless for reproducible corpus curation. These
  * samplers decide membership from a Knuth multiplicative hash of the
  * row's OWN id, so the same row makes the same call everywhere: the
  * sample is reproducible, any engine computes the identical subset
  * (integer arithmetic only — oracle-exact), resampling at a larger
  * fraction is a SUPERSET of the smaller one (fractions nest, so a 1%
  * pilot is always contained in the 10% run), and no coordination or
  * shuffle is needed — membership is a stateless per-row filter
  * evaluated in the scan stage (codegen'd integer ops; arithmetic
  * predicates don't become parquet PushedFilters, but they run before
  * anything wide).
  */
object Sampling {

  /** Knuth's multiplicative constant (2^32 / φ, odd). */
  private val Knuth = 2654435761L
  private val M = 1L << 32

  /** Sample bucket in [0, 2^32): Knuth multiplicative hash of the id.
    *
    * The multiply is split into 16-bit halves so no intermediate ever
    * exceeds ~2^49: a plain `residue * 2654435761` overflows a signed
    * Long for residues >= ~3.47e9 (~19% of the residue space) — an
    * ArithmeticException under Spark's default ANSI mode, and a BIGINT
    * overflow error in DuckDB. With r = hi*2^16 + lo (hi, lo < 2^16):
    *   (r*K) mod 2^32 = ((hi*K mod 2^32)*2^16 + lo*K) mod 2^32
    * where (hi*K mod 2^32)*2^16 < 2^48 and lo*K < 2^48 — overflow-free
    * pure-Long arithmetic, identical on every engine. */
  def bucket(id: Column): Column = {
    val r  = pmod(id, lit(M))
    val hi = shiftright(r, 16)
    val lo = r.bitwiseAND(lit(0xFFFFL))
    pmod(pmod(hi * lit(Knuth), lit(M)) * lit(1L << 16) + lo * lit(Knuth), lit(M))
  }

  /** Keep a deterministic `fraction` of rows, decided per row by id
    * hash. fraction ∈ [0, 1]; fractions nest (0.01 ⊂ 0.1 ⊂ 0.5). */
  def consistentSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction in [0,1]: $fraction")
    df.filter(bucket(col(idCol)) < lit((fraction * M).toLong))
  }

  /** Exactly-n deterministic uniform sample — the FIXED-SIZE companion
    * of [[consistentSample]] (which is rate-based and only
    * approximately sized): rows rank by `(Knuth bucket, id)` and the
    * first `n` win. Reproducible cross-engine, stable per row, and
    * NESTED — the bucket order is a fixed global permutation, so the
    * n'-row sample is a strict prefix of the n-row sample for n' < n
    * (grow a dev set without resampling the old one). Scale shape: a
    * distributed TakeOrdered (per-partition top-n, driver merges
    * n·partitions HEADS only) — never a global sort of the corpus. */
  def fixedSizeSample(df: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    df.withColumn("__bk", bucket(col(idCol)))
      .orderBy(col("__bk").asc, col(idCol).asc)
      .limit(n)
      .drop("__bk")
  }

  /** Exactly-n deterministic sample PER STRATUM — the grouped form of
    * [[fixedSizeSample]] ("10 spot-check docs per language"): within
    * each stratum rows rank by `(Knuth bucket, id)` and the first `n`
    * win. Same contracts as the global form — reproducible
    * cross-engine, partitioning-invariant, and nested per stratum
    * (n' < n is a strict prefix of n, stratum by stratum).
    *
    * Scale shape: a per-stratum rank window would sort EVERY stratum's
    * full population in one task each (the hot-key shape ruled out for
    * [[tokenBudgetSample]]), so the production path PRE-FILTERS with
    * the rate-based sampler first: per-stratum counts are k-row driver
    * model state (the [[temperatureMix]] precedent), each stratum keeps
    * rows at rate `min(1, oversample·n/count)` — an expected
    * `oversample·n` survivors — and only the survivors rank. The n
    * smallest buckets of a stratum all sit below the stratum's rate cut
    * whenever the stratum has ≥ n surviving rows, so the result is
    * EXACT, not approximate; strata the prefilter left short of n
    * (possible — the hash is deterministic, not lucky) fall back to
    * ranking their full population, detected by one bounded survivor
    * count per stratum (the filtered-ANN fallback pattern). */
  def groupFixedSizeSample(df: DataFrame, idCol: String, strataCol: String,
                           n: Int, oversample: Double = 8.0): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(oversample >= 1.0, s"oversample must be >= 1: $oversample")
    // per-stratum cut as a BROADCAST-JOINED rate table (the
    // token_budget_mix pattern), not a nested when-chain: a collected
    // fold built an O(|strata|)-deep expression — fine at low
    // cardinality, but a high-cardinality strata column blows up plan
    // size on the driver (round-16 verdict). Same arithmetic, same
    // IEEE doubles: rate = min(1, oversample·n / count), cut =
    // ceil(rate · M) — both engines' ceil agree on longs < 2^53.
    val cuts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
      .select(col(strataCol),
        ceil(least(lit(1.0), lit(oversample * n) / col("__n").cast("double"))
          * lit(M.toDouble)).cast("long").as("__cut"))
    val survivors = df.join(broadcast(cuts), Seq(strataCol))
      .filter(bucket(col(idCol)) < col("__cut"))
      .drop("__cut")
    val short = survivors.groupBy(col(strataCol)).agg(count(lit(1)).as("__sn"))
      .filter(col("__sn") < n).collect().map(_.get(0).toString).toSeq
    val cand =
      if (short.isEmpty) survivors
      else survivors.filter(!col(strataCol).isin(short: _*))
        .unionByName(df.filter(col(strataCol).isin(short: _*)))
    rankFirstN(cand, idCol, strataCol, n)
  }

  /** The one-window-per-stratum transcription of
    * [[groupFixedSizeSample]] — the executable specification the
    * prefiltered path is equivalence-tested against, and the shape the
    * DuckDB oracle replays. NOT the production path: every stratum
    * sorts whole in one task. */
  private[graft] def groupFixedSizeSampleWindow(df: DataFrame, idCol: String,
                                                strataCol: String, n: Int): DataFrame =
    rankFirstN(df, idCol, strataCol, n)

  private def rankFirstN(df: DataFrame, idCol: String, strataCol: String,
                         n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(bucket(col(idCol)).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic named split (train/val/test): assign each row by its
    * hash bucket against cumulative fraction cut points. Splits are
    * disjoint, exhaustive, engine-reproducible, and STABLE under corpus
    * growth — a row's split is a pure function of its own id, so adding
    * documents never reshuffles existing assignments (the property
    * `randomSplit` lacks). Prefer fractions that are exact in 2^32
    * (eighths, sixteenths…): the cut `fraction * 2^32` is then the same
    * integer under double truncation and DECIMAL rounding, so no engine
    * disagrees on a boundary bucket. */
  def splitAssign(id: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty, "at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val b = bucket(id)
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.zip(cuts).dropRight(1).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), acc) =>
        when(b < lit((cut * M).toLong), lit(name)).otherwise(acc)
    }
  }

  /** Deterministic WEIGHTED sample of k rows without replacement
    * (Efraimidis–Spirakis "A-ES", Inf. Proc. Letters 97(5), 2006 —
    * public): each row draws u ∈ (0,1] from its own id hash and
    * competes on the key ln(u)/w — the k largest keys are a weighted
    * sample without replacement, each row's inclusion odds
    * proportional to its weight. The training-data use is
    * quality-weighted corpus subsampling: weight = token count or a
    * quality score, and the sample is reproducible (same corpus →
    * same rows on every run and engine, integer hash + round-6 key).
    * Scale shape: per-row arithmetic + `TakeOrderedAndProject` —
    * a bounded per-partition heap, no shuffle beyond the k-row merge.
    * Non-positive weights are excluded (inclusion probability 0). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    // u in (0,1]: (bucket + 1)/2^32 never hits ln(0); keys are ≤ 0 and
    // larger-is-better (equivalent to maximizing u^(1/w)); round-6 so
    // libm ln drift cannot flip a rank cross-engine (id tiebreak)
    val u = (bucket(col(idCol)) + lit(1L)).cast("double") / lit(M.toDouble)
    df.filter(col(weightCol) > 0)
      .withColumn("es_key", round(log(u) / col(weightCol), 6))
      .orderBy(col("es_key").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic token-budget sampling per stratum — the data-MIXING
    * op of a training pipeline: "x billion tokens of English, y of
    * code, …". Rows compete in Knuth-hash order (id tiebreak) inside
    * their stratum and are kept while the stratum's EXCLUSIVE running
    * token total is under its budget, so membership is reproducible,
    * growing a budget yields a superset (prefixes nest along the hash
    * order), and the overshoot is bounded by one document. Unlisted
    * strata get `defaultBudget`.
    *
    * Scale shape: a TWO-PHASE distributed prefix sum, never a window
    * over a whole stratum. Strata are few and huge (at 100 TB "en" is
    * billions of rows — one cumulative-sum window per stratum would
    * sort a whole stratum in ONE task, the hot-key shape PLANS.md's
    * skew measurements rule out). Instead the hash order is cut into
    * `rangeBuckets` ranges by the top bits of the Knuth bucket (the
    * range boundaries ARE hash-order boundaries, so ordering is
    * preserved across buckets):
    *  1. per-(stratum, range) INCLUSIVE running sums via a window over
    *     that bucket only — parallelism = strata × rangeBuckets;
    *  2. per-(stratum, range) subtotals (map-side-combined agg, one row
    *     per group) → exclusive range offsets via a broadcast non-equi
    *     self-join (the [[SeqPack.packWindows]] machinery);
    *  3. exclusive cum = offset + running − own weight; keep while
    *     under budget.
    * The subtotal branch re-scans the source, but pruned to the three
    * id/weight/stratum columns and combined map-side to
    * strata × rangeBuckets rows — cheaper than persisting the corpus
    * or sorting a stratum in one task. */
  def tokenBudgetSample(df: DataFrame, idCol: String, weightCol: String,
                        strataCol: String, budgets: Map[String, Long],
                        defaultBudget: Long = 0L,
                        rangeBuckets: Int = 256): DataFrame = {
    require(rangeBuckets >= 1 && (rangeBuckets & (rangeBuckets - 1)) == 0,
      s"rangeBuckets must be a power of two: $rangeBuckets")
    val shift = 32 - java.lang.Integer.numberOfTrailingZeros(rangeBuckets)
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (k, b)) => when(col(strataCol) === k, lit(b)).otherwise(acc)
    }
    val keyed = df
      .withColumn("__b", bucket(col(idCol)))
      .withColumn("__hb", shiftright(col("__b"), shift))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol), col("__hb"))
      .orderBy(col("__b").asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val sub = keyed.groupBy(col(strataCol), col("__hb"))
      .agg(sum(col(weightCol).cast("long")).as("__pn"))
    val offsets = sub.as("a")
      .join(broadcast(sub.as("b")),
        col(s"a.$strataCol") === col(s"b.$strataCol") &&
          col("b.__hb") < col("a.__hb"), "left")
      .groupBy(col(s"a.$strataCol").as(strataCol), col("a.__hb").as("__hb"))
      .agg(coalesce(sum(col("b.__pn")), lit(0L)).as("__poff"))
    keyed
      .withColumn("__run", sum(col(weightCol).cast("long")).over(wLocal))
      .join(broadcast(offsets), Seq(strataCol, "__hb"))
      .filter(col("__poff") + col("__run") - col(weightCol) < budget)
      // the using-join moved strataCol/__hb to the front; restore the
      // input's column order so positional consumers see the same
      // schema as the windowed spec
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** The one-window-per-stratum form of [[tokenBudgetSample]] — the
    * direct transcription of the semantics, and the shape the DuckDB
    * oracle replays. NOT the production path (a whole stratum sorts in
    * one task); kept as the executable specification the two-phase
    * implementation is equivalence-tested against. */
  private[graft] def tokenBudgetSampleWindow(
      df: DataFrame, idCol: String, weightCol: String,
      strataCol: String, budgets: Map[String, Long],
      defaultBudget: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(bucket(col(idCol)).asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (k, b)) => when(col(strataCol) === k, lit(b)).otherwise(acc)
    }
    df.withColumn("__cum", coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .filter(col("__cum") < budget)
      .drop("__cum")
  }

  /** Temperature-flattened source mixing — the multilingual-LM
    * alpha-sampling primitive (XLM-R, mBART; Dolma's source
    * balancing): per-source keep rates derived from `n_s^alpha` so
    * `alpha = 1` keeps natural proportions and `alpha → 0` approaches
    * uniform across sources, scaled so the EXPECTED kept total is
    * `budget` documents. `q_s = n_s^alpha / Σ_t n_t^alpha`,
    * `rate_s = min(1, budget · q_s / n_s)` — a rate above 1 caps (a
    * small source cannot be upsampled without replacement; the cap
    * means the realized total can undershoot the budget, the standard
    * trade). Membership is the [[consistentSample]] contract: decided
    * per row from the Knuth hash of its OWN id, so the mix is
    * reproducible cross-run/cross-engine and nests as the budget
    * grows (rates grow monotonically with the budget, holding counts
    * fixed).
    *
    * Determinism: per-source counts are MODEL STATE (k rows — the
    * centroid-collect precedent), so the rate arithmetic runs once on
    * the driver in a DEFINED order (strata sorted by name for the
    * denominator fold); rates round to 6 (the project float contract)
    * before the integer cut, and `alpha = 0.5` computes through IEEE
    * sqrt (correctly rounded on every engine — the oracle's form).
    * Other alphas go through `pow`, with the round-6 rate absorbing
    * libm drift except within 5e-7 of a rounding boundary (the same
    * documented exposure class as the PQ-code contract). Scale shape:
    * one map-side-combined k-row count aggregate, then a stateless
    * per-row filter against stratum-literal cuts in the scan stage. */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
                     alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1]: $alpha")
    require(budget >= 0L, s"budget >= 0: $budget")
    def p(n: Double): Double =
      if (alpha == 0.5) math.sqrt(n) else math.pow(n, alpha)
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.get(0).toString, r.getLong(1))).sortBy(_._1)
    require(counts.nonEmpty, "empty input")
    val denom = counts.foldLeft(0.0) { case (acc, (_, n)) => acc + p(n.toDouble) }
    val cuts = counts.map { case (s, n) =>
      val rate = math.min(1.0, budget.toDouble * (p(n.toDouble) / denom) / n.toDouble)
      s -> math.floor(graft.vector.VectorOps.round6(rate) * M.toDouble).toLong
    }
    val cut = cuts.foldLeft(lit(0L): Column) {
      case (acc, (s, c)) => when(col(strataCol) === s, lit(c)).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < cut)
  }

  /** Data-budget mix PLANNER (Muennighoff et al. 2023, "Scaling
    * data-constrained language models": repeating data beyond ~4
    * epochs yields rapidly diminishing returns) — the report that
    * turns [[temperatureMix]]'s keep-rates into an epoch audit. Given
    * per-stratum token masses, a total training-token budget, and
    * temperature `alpha`, allocate the budget by flattened weights
    * `mass^alpha` and report, per stratum: available tokens, allocated
    * tokens, implied epochs, the `maxEpochs`-clamped effective tokens,
    * and whether the clamp fired (a capped source needs MORE DATA, not
    * more sampling weight — the planner's actionable output).
    *
    * Determinism: masses are k-row driver model state (the
    * temperatureMix pattern); the weight denominator folds once in
    * sorted-stratum order, shares round-6 before the integer floor
    * multiply, alpha = 0.5 computes through IEEE sqrt. Scale: one
    * map-side-combined aggregate; the report is k rows.
    */
  def epochsPerSource(df: DataFrame, strataCol: String,
                      tokens: Column, alpha: Double, budget: Long,
                      maxEpochs: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1]: $alpha")
    require(budget >= 0L && maxEpochs > 0.0, "budget >= 0, maxEpochs > 0")
    def p(n: Double): Double =
      if (alpha == 0.5) math.sqrt(n) else math.pow(n, alpha)
    val masses = df.groupBy(col(strataCol)).agg(sum(tokens).as("__t"))
      .collect().map(r => (r.get(0).toString, r.getLong(1))).sortBy(_._1)
    require(masses.nonEmpty, "empty input")
    val denom = masses.foldLeft(0.0) { case (acc, (_, t)) => acc + p(t.toDouble) }
    val rows = masses.map { case (s, t) =>
      val share = graft.vector.VectorOps.round6(p(t.toDouble) / denom)
      val alloc = math.floor(share * budget.toDouble).toLong
      val cap = math.floor(maxEpochs * t.toDouble).toLong
      val eff = math.min(alloc, cap)
      (s, t, alloc,
        graft.vector.VectorOps.round6(alloc.toDouble / t.toDouble),
        eff, if (alloc > eff) 1L else 0L)
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF(strataCol, "n_tokens", "alloc_tokens", "epochs",
      "eff_tokens", "capped")
  }

  /** Stratified deterministic sample: an independent fraction per
    * stratum value (e.g. per language), unlisted strata default to
    * `defaultFraction`. Same per-row determinism and nesting as
    * [[consistentSample]] — and unlike `DataFrame.stat.sampleBy`, the
    * result is identical on every run and engine. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq).forall(f => f >= 0.0 && f <= 1.0),
      "fractions in [0,1]")
    val cut = fractions.foldLeft(lit((defaultFraction * M).toLong)) {
      case (acc, (k, f)) => when(col(strataCol) === k, lit((f * M).toLong)).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < cut)
  }

  /** Deterministic per-EPOCH training order — the "global shuffle"
    * every multi-epoch LLM run needs (sequential corpus order biases
    * gradients; `rand()` orders don't reproduce): epoch e ranks row
    * id by `(knuthBucket(id·1024 + e), id)`, so each epoch is an
    * independent-looking permutation, every engine derives the
    * identical order, and re-running epoch e replays it exactly.
    * Returns `(epoch, rank, idCol)`, ranks 1-based per epoch.
    *
    * Scale shape: materializing a training order IS a global sort —
    * one per epoch, partitioned by epoch (write
    * `partitionBy("epoch")` sorted files and the ranks never need to
    * exist as a column). The ×epochs fan-out carries id rows only,
    * never document bodies — join bodies back by id at read time. */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochs >= 1: $epochs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"))
      .orderBy(bucket(col(idCol) * lit(1024L) + col("epoch")), col(idCol))
    df.select(col(idCol), explode(sequence(lit(1), lit(epochs))).as("epoch"))
      .withColumn("rank", row_number().over(w))
      .select(col("epoch").cast("long").as("epoch"),
        col("rank").cast("long").as("rank"), col(idCol))
  }
}
