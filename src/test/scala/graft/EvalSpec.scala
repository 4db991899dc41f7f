package graft

import org.apache.spark.sql.functions._

import graft.analysis.{Dedup, Eval}

/** Retrieval eval metrics (closed-form fixtures) and SemDeDup keep-set
  * invariants. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  // Axis-aligned vectors make cosine exact: e0·e0 = 1, e0·e1 = 0, and
  // a mix like (3,4)/5-style directions gives strictly ordered sims.
  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("MRR and nDCG match hand-computed values on a closed-form fixture") {
    // corpus: 4 docs on 2 labels. Query q0 (label 0) has sims
    // 1.0 (id 0, label 0), 0.8 (id 1, label 1), 0.6 (id 2, label 1),
    // 0.0 (id 3, label 0)  →  relevant at ranks 1 and 4.
    val corpus = Seq(
      (0L, vec(1, 0), 0),
      (1L, vec(0.8, 0.6), 1),
      (2L, vec(0.6, 0.8), 1),
      (3L, vec(0, 1), 0)
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq((100L, vec(1, 0), 0)).toDF("qid", "qvec", "qlabel")

    val row = Eval.retrievalEval(corpus, queries, k = 4).collect().head
    assert(row.getLong(0) == 1)
    assert(row.getDouble(1) == 1.0) // first relevant at rank 1
    // DCG = 1/log2(2) + 1/log2(5); IDCG (2 relevant) = 1/log2(2) + 1/log2(3)
    val dcg = 1.0 + 1.0 / (math.log(5) / math.log(2))
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2))
    assert(math.abs(row.getDouble(2) - math.rint(dcg / idcg * 1e6) / 1e6) < 1e-9)
  }

  test("query with no relevant corpus rows contributes 0, never NULL") {
    val corpus = Seq((0L, vec(1, 0), 0)).toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (1L, vec(1, 0), 0),   // perfect: rr = ndcg = 1
      (2L, vec(1, 0), 99)   // label absent from corpus: contributes 0
    ).toDF("qid", "qvec", "qlabel")
    val row = Eval.retrievalEval(corpus, queries, k = 3).collect().head
    assert(row.getLong(0) == 2)
    assert(row.getDouble(1) == 0.5)
    assert(row.getDouble(2) == 0.5)
  }

  test("rankedEval: rank-input form — zero-hit query counts 0, unknown id counts rel 0") {
    val corpus = Seq(
      (10L, "a"), (11L, "b"), (12L, "a")
    ).toDF("doc_id", "label")
    // q1: hits at ranks 1 (rel) and 2 (not); q2: NO result rows at all
    // (keyword retrieval with no matching term); q3: one hit on an id
    // absent from the corpus (rel 0, not NULL)
    val queries = Seq((1L, "a"), (2L, "a"), (3L, "a")).toDF("qid", "qlabel")
    val results = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.5),
      (3L, 999L, 0.7)
    ).toDF("qid", "doc_id", "score")
    val row = Eval.rankedEval(results, "score", queries, corpus, k = 2,
      idCol = "doc_id", labelCol = "label").collect().head
    assert(row.getLong(0) == 3, "the zero-hit query must still count")
    // rr: q1 = 1, q2 = 0, q3 = 0 → mean 1/3
    assert(row.getDouble(1) == math.rint(1.0 / 3.0 * 1e6) / 1e6)
    // ndcg: q1 dcg = 1 (rank 1 rel only), idcg (2 relevant, k=2)
    // = 1 + 1/log2(3); q2 = q3 = 0
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2))
    assert(math.abs(row.getDouble(2) - math.rint(1.0 / idcg / 3.0 * 1e6) / 1e6) < 1e-9)
  }

  test("rankedEval truncates to k and re-ranks by (order DESC, id ASC)") {
    val corpus = Seq((1L, "a"), (2L, "a"), (3L, "a")).toDF("doc_id", "label")
    val queries = Seq((0L, "a")).toDF("qid", "qlabel")
    // score tie between ids 2 and 3 → id ASC breaks it; k=1 truncates
    val results = Seq((0L, 3L, 0.8), (0L, 2L, 0.8), (0L, 1L, 0.1))
      .toDF("qid", "doc_id", "score")
    val row = Eval.rankedEval(results, "score", queries, corpus, k = 1,
      idCol = "doc_id", labelCol = "label").collect().head
    assert(row.getDouble(1) == 1.0, "rank 1 must be id 2 (tie to lower id), relevant")
  }

  test("rankedEvalCurve: per-k rows match hand values and agree with rankedEval at each k") {
    val corpus = Seq((10L, "a"), (11L, "b"), (12L, "a")).toDF("doc_id", "label")
    val queries = Seq((1L, "a"), (2L, "a"), (3L, "a")).toDF("qid", "qlabel")
    val results = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.5),
      (3L, 999L, 0.7)
    ).toDF("qid", "doc_id", "score")
    val curve = Eval.rankedEvalCurve(results, "score", queries, corpus,
        ks = Seq(1, 2), idCol = "doc_id", labelCol = "label")
      .orderBy("k").collect()
    assert(curve.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(curve.forall(_.getLong(1) == 3))
    // k=1: q1 hits rank 1 (rel, n_rel=2 → recall 1/2), q2 zero-hit, q3
    // unknown id → mrr = ndcg = 1/3, recall = 1/6
    val r6 = (x: Double) => math.rint(x * 1e6) / 1e6
    assert(curve(0).getDouble(2) == r6(1.0 / 3))
    assert(curve(0).getDouble(3) == r6(1.0 / 3))
    assert(curve(0).getDouble(4) == r6(0.5 / 3))
    // k=2: q1 dcg = 1, idcg = 1 + 1/log2(3)
    val idcg2 = 1.0 + 1.0 / (math.log(3) / math.log(2))
    assert(curve(1).getDouble(2) == r6(1.0 / 3))
    assert(math.abs(curve(1).getDouble(3) - r6(1.0 / idcg2 / 3)) < 1e-9)
    assert(curve(1).getDouble(4) == r6(0.5 / 3))
    // each curve row reproduces the single-k gate exactly
    for (k <- Seq(1, 2)) {
      val single = Eval.rankedEval(results, "score", queries, corpus, k,
        idCol = "doc_id", labelCol = "label").collect().head
      val row = curve(k - 1)
      assert(row.getDouble(2) == single.getDouble(1) &&
        row.getDouble(3) == single.getDouble(2), s"curve diverges at k=$k")
    }
  }

  test("hardNegatives: only label-mismatched rows, ranked over the filtered subset") {
    val corpus = Seq(
      (0L, vec(1, 0), 0),      // relevant, sim 1.0 — must NOT take a slot
      (1L, vec(0.8, 0.6), 1),
      (2L, vec(0.6, 0.8), 1),
      (3L, vec(0, 1), 0)
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq((100L, vec(1, 0), 0)).toDF("qid", "qvec", "qlabel")
    val out = Eval.hardNegatives(corpus, queries, k = 2).orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2))
    assert(out.forall(_.getInt(3) == 1), "a relevant row leaked into the negatives")
  }

  test("metrics are invariant to corpus partitioning") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    def run(parts: Int) = Eval.retrievalEval(
      emb.filter(col("vec_id") % 25 =!= 0).repartition(parts),
      emb.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label").as("qlabel")),
      k = 10).collect().toSeq
    assert(run(1) == run(16))
  }

  test("semDedup: dropped rows have a kept-or-dropped smaller same-cluster " +
      "neighbor above threshold; kept rows have none") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val t = 0.3
    val out = Dedup.semDedup(emb, "vec_id", "embedding", k = 5, iters = 2, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == emb.count())
    // recompute ground truth: same centroids (deterministic build),
    // same assignment, exact pairwise within cluster
    val cents = graft.search.Ann.kmeansCentroids(emb, "vec_id", "embedding", 5, 2)
    val assigned = emb.withColumn("c",
        graft.search.Ann.assignCluster(col("embedding"), cents))
      .select(col("vec_id"), col("c"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val expected = assigned.map { case (id, c, v) =>
      val smaller = assigned.filter { case (id2, c2, v2) =>
        c2 == c && id2 < id && cos(v2, v) >= t
      }
      id -> (if (smaller.isEmpty) (-1L, true) else (smaller.map(_._1).min, false))
    }.toMap
    for ((id, dupOf, keep) <- out) {
      assert((dupOf, keep) == expected(id), s"vec_id=$id")
    }
    // the fixture must exercise both outcomes
    assert(out.exists(!_._3) && out.exists(_._3))
  }

  test("semDedup pair join stays keyed on the cluster id (no cartesian)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val p = Dedup.semDedup(emb, "vec_id", "embedding", 5, 1, 0.3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("uniformNegatives: hash-exact candidates, no true interaction leaks, rerun-stable") {
    import spark.implicits._
    val inter = Seq((1L, 0L), (1L, 1L), (2L, 3L)).toDF("u", "it")
    def run = Eval.uniformNegatives(inter, "u", "it", nItems = 4L, k = 2,
        oversample = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val out = run
    assert(run == out, "must be rerun-identical")
    // closed-form candidate stream: Knuth bucket of u*1024+i mod 4
    def bucket(id: Long): Long = {
      val K = 2654435761L; val M = 1L << 32
      val r = id % M; val hi = r >> 16; val lo = r & 0xFFFFL
      ((hi * K % M) * 65536 + lo * K) % M
    }
    def expected(u: Long, banned: Set[Long]): List[(Long, Long, Long)] = {
      val cands = (0 until 6).map(i => (bucket(u * 1024 + i) % 4, i))
      val firstI = cands.groupBy(_._1).map { case (it, xs) => (it, xs.map(_._2).min) }
      firstI.toList.filterNot(x => banned(x._1)).sortBy(_._2)
        .take(2).zipWithIndex.map { case ((it, _), r) => (u, (r + 1).toLong, it) }
    }
    assert(out.sorted == (expected(1L, Set(0L, 1L)) ++ expected(2L, Set(3L))).sorted,
      s"got $out")
    // no emitted negative is a true interaction
    val pos = Set((1L, 0L), (1L, 1L), (2L, 3L))
    assert(out.forall { case (u, _, it) => !pos((u, it)) })
  }

  test("mrrBootstrapCi: CI brackets the point estimate and is reproducible") {
    import org.apache.spark.sql.functions._
    import graft.analysis.Eval
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 25 =!= 0)
    val qs = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    def run() = Eval.mrrBootstrapCi(corpus, qs, k = 10, resamples = 100).head()
    val r = run()
    val (mrr, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo <= mrr && mrr <= hi, s"CI [$lo, $hi] must bracket point $mrr")
    assert(lo < hi, "a non-degenerate query set has a non-zero-width CI")
    // the draws are deterministic: identical rerun, identical interval
    val r2 = run()
    assert(r.toSeq == r2.toSeq, s"rerun diverged: ${r.toSeq} vs ${r2.toSeq}")
    // point estimate agrees with the plain eval's MRR
    val plain = Eval.retrievalEval(corpus, qs, 10).head().getDouble(1)
    assert(mrr == plain, s"bootstrap point $mrr vs rankedEval $plain")
  }

  test("contextPrecisionGate: exact integer arithmetic, no-result queries gate as zero") {
    import org.apache.spark.sql.functions._
    import graft.analysis.Eval
    // q1: 2/2 relevant; q2: 1/2; q3 retrieved NOTHING (in roster only)
    val results = Seq(
      (1L, 0, 0), (1L, 0, 0),
      (2L, 1, 1), (2L, 1, 0)
    ).toDF("qid", "qlabel", "label")
    val roster = Seq(1L, 2L, 3L).toDF("qid")
    val r = Eval.contextPrecisionGate(results, roster, k = 2).head()
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 0.5, s"mean: (2+1+0)/(3*2) = 0.5, got ${r.getDouble(1)}")
    assert(r.getDouble(2) == 0.0, "the no-result query is the worst prompt")
    assert(r.getDouble(3) == 0.333333, "only q1's context is fully on-topic")
    // MRR blindness pinned: q2 has MRR-at-2 of 1.0 (first hit at rank 1)
    // but only half its context is relevant - the gate sees the half
    val one = Eval.contextPrecisionGate(
      results.filter(col("qid") === 2L), Seq(2L).toDF("qid"), k = 2).head()
    assert(one.getDouble(1) == 0.5 && one.getDouble(3) == 0.0)
  }

  test("contextRecallGate: both denominators, no-result zero, zero-relevant vacuous 1.0") {
    import graft.analysis.Eval
    // corpus classes: label 0 has 4 relevant rows, label 1 has 1,
    // label 2 has 0 (an empty class in the corpus)
    val corpus = Seq((10L, 0), (11L, 0), (12L, 0), (13L, 0), (14L, 1))
      .toDF("vec_id", "label")
    // q1 (label 0): 2 of its 4 relevant retrieved -> recall 0.5,
    //   capped 2/min(2,4) = 1.0 (its context window did the best it could)
    // q2 (label 1): retrieved both slots off-topic -> 0/1 = 0
    // q3 (label 2): zero relevant exist -> vacuously complete, 1.0
    // q4: in roster, retrieved NOTHING, label 0 -> recall 0
    val results = Seq(
      (1L, 0, 0), (1L, 0, 0),
      (2L, 1, 0), (2L, 1, 0)
    ).toDF("qid", "qlabel", "label")
    val roster = Seq((1L, 0), (2L, 1), (3L, 2), (4L, 0))
      .toDF("qid", "qlabel")
    val r = Eval.contextRecallGate(results, roster, corpus, k = 2).head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 0.375, s"mean (0.5+0+1+0)/4, got ${r.getDouble(1)}")
    assert(r.getDouble(2) == 0.0, "worst prompt: a no-hit query")
    assert(r.getDouble(3) == 0.5, s"capped (1.0+0+1+0)/4, got ${r.getDouble(3)}")
    // precision blindness pinned: q1 is 2/2 on-topic (precision 1.0)
    // yet covers only half its relevant class — recall sees it
    val one = Eval.contextRecallGate(
      results.filter(col("qid") === 1L), Seq((1L, 0)).toDF("qid", "qlabel"),
      corpus, k = 2).head()
    assert(one.getDouble(1) == 0.5 && one.getDouble(3) == 1.0)
  }

  test("faithfulnessGate: hand values, echo-only vacuous 1.0, missing answer gates 0/0") {
    import graft.analysis.Eval
    // q1: question {what, is, spark}; answer adds claims {fast, engine,
    //   alien}; context holds {spark, fast, engine, data} -> supported
    //   2/3; relevance: qt∩at = {what,is,spark} wait answer carries the
    //   echo -> |∩|=3, |∪|=6 -> 0.5
    // q2: answer = the question verbatim -> no claims, vacuous 1.0;
    //   relevance 1.0 (identical token sets)
    // q3: in roster, NO answer row -> 0/0
    val answers = Seq(
      (1L, "what is spark", "what is spark fast engine alien",
        "spark fast engine data"),
      (2L, "какой индекс", "какой индекс", "unrelated context")
    ).toDF("qid", "question", "answer", "context")
    val roster = Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)).toDF("qid")
    val r = Eval.faithfulnessGate(answers, roster).head()
    assert(r.getAs[Long]("n_queries") == 3L)
    // f: q1 = 2/3, q2 = 1.0, q3 = 0 -> mean round((2/3 + 1)/3, 6)
    assert(r.getAs[Double]("mean_faithfulness") == 0.555556, r.toString)
    assert(r.getAs[Double]("min_faithfulness") == 0.0)
    assert(r.getAs[Double]("frac_fully_faithful") == 0.333333)
    // r: q1 = 3/6, q2 = 1.0, q3 = 0 -> mean 0.5
    assert(r.getAs[Double]("mean_answer_relevance") == 0.5)
    assert(r.getAs[Double]("min_answer_relevance") == 0.0)
    // an unfaithful answer next to a perfect context-precision is the
    // case the retrieval gates cannot see: same context, answer claims
    // only the alien token -> faithfulness 0
    val bad = Eval.faithfulnessGate(
      Seq((1L, "what is spark", "what is spark alien",
        "spark fast engine data")).toDF("qid", "question", "answer", "context"),
      Seq(Tuple1(1L)).toDF("qid")).head()
    assert(bad.getAs[Double]("mean_faithfulness") == 0.0)
  }

  test("faithfulnessGate: duplicate answer rows per qid reduce to the worst, not fan out") {
    import graft.analysis.Eval
    // an at-least-once answer-log replay delivers q1 twice: once clean
    // (f = 1.0) and once with an unsupported claim (f = 0.5). The gate
    // must keep n_queries at the roster size and score q1 by the WORST
    // observation — a raw roster join would count q1 twice and weight
    // the mean by delivery multiplicity (round-17 advice).
    val answers = Seq(
      (1L, "what is spark", "what is spark fast", "spark fast engine"),
      (1L, "what is spark", "what is spark fast alien", "spark fast engine"),
      (2L, "какой индекс", "какой индекс", "unrelated")
    ).toDF("qid", "question", "answer", "context")
    val roster = Seq(Tuple1(1L), Tuple1(2L)).toDF("qid")
    val r = Eval.faithfulnessGate(answers, roster).head()
    assert(r.getAs[Long]("n_queries") == 2L, r.toString)
    // q1 min(1.0, 0.5) = 0.5; q2 vacuous 1.0 -> mean 0.75
    assert(r.getAs[Double]("mean_faithfulness") == 0.75, r.toString)
    assert(r.getAs[Double]("min_faithfulness") == 0.5)
    // fully-faithful counts the deduped q2 only
    assert(r.getAs[Double]("frac_fully_faithful") == 0.5)
  }
}
