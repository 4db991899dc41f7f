package graft

import org.apache.spark.sql.functions._

import graft.text.Unigram

/** Unigram-LM tokenizer trainer: the distributed Viterbi DP against a
  * local reference implementation, the coverage floor, the prune
  * budget, and the encode join's position contract. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** Local reference Viterbi — same edge order, same strictly-greater
    * first-edge tie rule as [[Unigram.segmented]]'s fold. */
  private def refViterbi(w: String, logp: Map[String, Double],
                         maxPieceLen: Int): Seq[String] = {
    val n = w.length
    val edges = (for {
      i <- 0 until n
      l <- 1 to math.min(maxPieceLen, n - i)
      p = w.substring(i, i + l) if logp.contains(p)
    } yield (i + l, i, p)).sortBy(e => (e._1, e._2, e._3))
    val best = Array.fill(n + 1)(-1e18); best(0) = 0.0
    val back = Array.fill[(Int, String)](n + 1)(null)
    edges.foreach { case (j, i, p) =>
      if (best(i) > -1e17 && best(i) + logp(p) > best(j)) {
        best(j) = best(i) + logp(p); back(j) = (i, p)
      }
    }
    var pos = n
    val out = List.newBuilder[String]
    val rev = scala.collection.mutable.ListBuffer.empty[String]
    while (pos > 0) { val (i, p) = back(pos); rev.prepend(p); pos = i }
    out ++= rev
    out.result()
  }

  test("distributed Viterbi DP ≡ local reference on every corpus word") {
    val docs = graft.io.Tables.documents(spark, sf0001)
    val wd = Unigram.wordDict(docs, "text")
    val vocab = Unigram.seedVocab(wd).localCheckpoint()
    val lp = Unigram.logProbs(vocab)
    val logp = lp.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = Unigram.segmented(wd, lp, maxPieceLen = 4)
      .select(col("w"), col("pieces")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(got.nonEmpty)
    got.foreach { case (w, pieces) =>
      assert(pieces == refViterbi(w, logp, 4),
        s"word '$w': got $pieces, want ${refViterbi(w, logp, 4)}")
    }
  }

  test("plan guard: the edge match is one broadcast hash join, no cartesian") {
    val docs = graft.io.Tables.documents(spark, sf0001)
    val wd = Unigram.wordDict(docs, "text")
    val seg = Unigram.segmented(wd,
      Unigram.logProbs(Unigram.seedVocab(wd)), 4)
    val plan = seg.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 1, plan.take(2000))
    for (bad <- Seq("CartesianProduct", "SortMergeJoin",
        "BroadcastNestedLoop"))
      assert(!plan.contains(bad), s"$bad in the segmentation plan")
  }

  test("coverage floor: unused single chars survive the prune with count 1") {
    // 'ab' dominates, so neither char is ever USED in a segmentation —
    // but dropping a char could leave a future word unsegmentable
    val docs = Seq((0L, "ab ab ab ab")).toDF("doc_id", "text")
    val v = Unigram.trainUnigram(docs, "text", vocabSize = 10,
      maxPieceLen = 2, seedSize = 10, rounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v("ab") == 4L, v.toString)
    assert(v("a") == 1L && v("b") == 1L,
      s"unused chars must stay at the floor: $v")
  }

  test("prune budget: multi-char pieces capped at vocabSize minus the alphabet") {
    val docs = graft.io.Tables.documents(spark, sf0001)
    val v = Unigram.trainUnigram(docs, "text", vocabSize = 30,
      maxPieceLen = 4, seedSize = 400, rounds = 1).collect()
    val (chars, multi) = v.partition(_.getString(0).length == 1)
    assert(multi.length <= 30 - chars.length,
      s"${multi.length} multi pieces vs budget ${30 - chars.length}")
    // every piece of the WORD alphabet is present
    val alphabet = graft.io.Tables.documents(spark, sf0001)
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("w"))
      .filter(length(col("w")) <= 16)
      .select(explode(split(col("w"), "")).as("c"))
      .filter(length(col("c")) === 1).distinct().collect()
      .map(_.getString(0)).toSet
    assert(chars.map(_.getString(0)).toSet == alphabet)
  }

  test("encode: every word position appears once, pieces concatenate back to the word") {
    val docs = graft.io.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 3)
    val vocab = Unigram.trainUnigram(
      graft.io.Tables.documents(spark, sf0001), "text",
      vocabSize = 120, rounds = 2)
    val enc = Unigram.encode(docs, "text", vocab).localCheckpoint()
    val rebuilt = enc
      .groupBy(col("doc_id"), col("wpos"))
      .agg(concat_ws("", sort_array(collect_list(
        struct(col("ppos"), col("piece"))))
        .getField("piece")).as("w2"))
    val words = docs.select(col("doc_id"),
      posexplode(graft.text.TextAnalysis.tokens(col("text")))
        .as(Seq("wpos", "w")))
    val joined = words.join(rebuilt, Seq("doc_id", "wpos"), "left")
    assert(joined.filter(col("w2").isNull || col("w2") =!= col("w"))
      .count() == 0L, "every word must rebuild from its pieces in order")
  }

  test("encode OOV: unknown chars emit <unk>, known substrings still segment, over-cap words drop") {
    val base = graft.io.Tables.documents(spark, sf0001)
    val vocab = Unigram.trainUnigram(base, "text", vocabSize = 120,
      rounds = 2).localCheckpoint()
    val docs = Seq((0L, "exza7ple " + "a" * 17)).toDF("doc_id", "text")
    val enc = Unigram.encode(docs, "text", vocab).localCheckpoint()
    // the 17-char word exceeds the cap: no rows at wpos 1
    assert(enc.filter(col("wpos") === 1).count() == 0L,
      "over-cap words must drop symmetrically with the oracle unroll")
    val pieces = enc.filter(col("wpos") === 0)
      .orderBy(col("ppos")).select(col("piece")).collect()
      .map(_.getString(0)).toSeq
    // 'x', 'z', '7' are outside the trained alphabet (a-w,y): each
    // covered by exactly one forced <unk>; the rest rebuilds the word
    assert(pieces.count(_ == Unigram.UnkPiece) == 3, pieces.toString)
    // substituting each <unk> back with the word's char at that
    // offset must rebuild the word exactly
    var off = 0
    val w = "exza7ple"
    val rebuilt2 = pieces.map { p =>
      val s = if (p == Unigram.UnkPiece) w.substring(off, off + 1) else p
      off += s.length; s
    }.mkString
    assert(rebuilt2 == w, s"pieces $pieces must tile '$w'")
  }

  test("soft E-step: forward–backward posteriors match the hand lattice") {
    // wd = {ab: 2}, vocab {a:1, b:1, ab:2}, total 4 → p_a=p_b=.25,
    // p_ab=.5. Z = .5 + .0625 = .5625; posterior(ab)=.888…,
    // posterior(a)=posterior(b)=.111…; ×wc=2, ×1e6, floor(+.5):
    val wd = Seq(("ab", 2L)).toDF("w", "wc")
    val vocab = Seq(("a", 1L), ("b", 1L), ("ab", 2L)).toDF("piece", "cnt")
    val got = Unigram.softUsage(wd, vocab, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 1777778L, "a" -> 222222L, "b" -> 222222L),
      got.toString)
  }

  test("soft vs hard: competitive-but-never-optimal pieces keep real mass") {
    // hard EM credits only the Viterbi path [ab], so 'a'/'b' sit at
    // the floor (count 1); soft EM gives them their posterior share
    val docs = Seq((0L, "ab ab ab ab")).toDF("doc_id", "text")
    val soft = Unigram.trainUnigramSoft(docs, "text", vocabSize = 10,
      maxPieceLen = 2, seedSize = 10, rounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(soft("a") > 1L && soft("b") > 1L,
      s"soft must distribute posterior mass to the char path: $soft")
    assert(soft("ab") > soft("a"), s"the dominant piece still wins: $soft")
  }

  test("soft trainer: budget, alphabet coverage, and rerun determinism") {
    val docs = graft.io.Tables.documents(spark, sf0001)
    def run() = Unigram.trainUnigramSoft(docs, "text", vocabSize = 30,
      maxPieceLen = 4, seedSize = 400, rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val a = run(); val b = run()
    assert(a.toSeq == b.toSeq,
      "micro-count quantization must make the soft M-step order-free")
    val (chars, multi) = a.partition(_._1.length == 1)
    assert(multi.length <= 30 - chars.length && multi.nonEmpty)
    assert(chars.forall(_._2 >= 1L), "the coverage floor holds")
  }

  test("nbest: hand lattice — ranks, deterministic score ties, distinct segmentations") {
    // w = "abc": [a,bc] = -2.5, [ab,c] = -2.5, [a,b,c] = -3.
    // The -2.5 tie breaks by back-position ASC ([a,bc]'s final edge
    // starts at 1 < [ab,c]'s 2) — the same first-edge-in-order
    // preference the Viterbi fold has.
    val words = Seq("abc").toDF("w")
    val lp = Seq(("a", -1.0), ("b", -1.0), ("c", -1.0),
      ("ab", -1.5), ("bc", -1.5)).toDF("piece", "lp")
    val out = Unigram.nbest(words, lp, maxPieceLen = 2, k = 3)
      .orderBy(col("rnk")).collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Double]("score"),
        r.getSeq[String](r.fieldIndex("pieces")).toSeq))
    assert(out.toSeq == Seq(
      (1L, -2.5, Seq("a", "bc")),
      (2L, -2.5, Seq("ab", "c")),
      (3L, -3.0, Seq("a", "b", "c"))), out.toSeq.toString)
    // k caps the list
    assert(Unigram.nbest(words, lp, 2, 2).count() == 2L)
  }

  test("nbest: rank 1 ≡ the Viterbi segmentation and score on every corpus word") {
    val docs = graft.io.Tables.documents(spark, sf0001)
    val vocab = Unigram.trainUnigram(docs, "text")
    val lp = Unigram.logProbs(vocab).localCheckpoint()
    val words = Unigram.wordDict(docs, "text").select(col("w"))
      .localCheckpoint()
    val vit = Unigram.segmented(words, lp, maxPieceLen = 4)
      .select(col("w"), col("pieces")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    val r1 = Unigram.nbest(words, lp, maxPieceLen = 4, k = 1).collect()
      .map(r => r.getAs[String]("w") ->
        (r.getSeq[String](r.fieldIndex("pieces")).toSeq,
          r.getAs[Double]("score"))).toMap
    assert(r1.keySet == vit.keySet)
    val logp = lp.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    r1.foreach { case (w, (pieces, score)) =>
      assert(pieces == vit(w), s"word '$w': $pieces vs viterbi ${vit(w)}")
      // the path score is the fold-order sum of round-6 edge lps
      val want = BigDecimal(pieces.foldLeft(0.0)((s, p) => s + logp(p)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(score == want, s"word '$w': score $score vs $want")
    }
    // a larger k never changes rank 1
    val r3 = Unigram.nbest(words, lp, 4, 3).filter(col("rnk") === 1)
      .collect()
      .map(r => r.getAs[String]("w") ->
        r.getSeq[String](r.fieldIndex("pieces")).toSeq).toMap
    assert(r3 == r1.view.mapValues(_._1).toMap)
  }

  test("sampledEncode: hand-checked draws follow the exact-rational selection rule; k=1 degenerates to Viterbi") {
    // vocab: pp(a) = pp(b) = 0.25, pp(ab) = 0.5; "ab" segments as
    // [ab] (p = .5, rank 1, q = 1e6) or [a, b] (p = .0625, rank 2,
    // q = floor(.125e6 + .5) = 125000); tot = 1125000 — rank 2 wins
    // iff u·tot > 1e6, i.e. u > 8/9
    val docs = (0L until 50L).map(i => (i, "ab")).toDF("doc_id", "text")
    val vocab = Seq(("a", 4L), ("b", 4L), ("ab", 8L)).toDF("piece", "cnt")
    val out = Unigram.sampledEncode(docs, "text", vocab,
        maxPieceLen = 2, k = 3)
      .groupBy("doc_id").agg(first(col("rnk")).as("rnk"),
        count(lit(1)).as("np"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // the expected draw per occurrence, replayed with the same bucket
    val us = docs.select(col("doc_id"),
        ((graft.analysis.Sampling.bucket(col("doc_id") * lit(1048576L))
          + lit(1L)).cast("double") / lit(4294967296.0)).as("u"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0L until 50L).foreach { i =>
      val want = if (us(i) * 1125000.0 <= 1000000.0) (1L, 1L) else (2L, 2L)
      assert(out(i) == want, s"doc $i u=${us(i)}: got ${out(i)}, want $want")
    }
    // both branches exercised by the fixture
    assert(out.values.map(_._1).toSet == Set(1L, 2L), out.toString)
    // k = 1 degenerates to the deterministic Viterbi encode
    val s1 = Unigram.sampledEncode(docs, "text", vocab,
      maxPieceLen = 2, k = 1)
    assert(s1.filter(col("rnk") =!= 1).isEmpty)
    assert(s1.select("doc_id", "wpos", "ppos", "piece").collect().toSet ==
      Unigram.encode(docs, "text", vocab, maxPieceLen = 2)
        .collect().toSet)
    // determinism: a rerun reproduces every draw
    val again = Unigram.sampledEncode(docs, "text", vocab,
      maxPieceLen = 2, k = 3).collect().toSet
    assert(again == Unigram.sampledEncode(docs, "text", vocab,
      maxPieceLen = 2, k = 3).collect().toSet)
    // alpha = 0.5 (IEEE-exact sqrt temperature): q2 = floor(sqrt(.125)
    // * 1e6 + .5) = 353553, tot = 1353553 — flatter draw, same rule
    val half = Unigram.sampledEncode(docs, "text", vocab,
        maxPieceLen = 2, k = 3, alpha = 0.5)
      .groupBy("doc_id").agg(first(col("rnk")).as("rnk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 50L).foreach { i =>
      val want = if (us(i) * 1353553.0 <= 1000000.0) 1L else 2L
      assert(half(i) == want, s"doc $i u=${us(i)}: got ${half(i)}, want $want")
    }
    // the flatter temperature draws MORE non-Viterbi segmentations
    assert(half.values.count(_ == 2L) > out.values.count(_._1 == 2L))
    // other temperatures are refused (pow is not engine-portable)
    intercept[IllegalArgumentException] {
      Unigram.sampledEncode(docs, "text", vocab, alpha = 0.7)
    }
  }
}
