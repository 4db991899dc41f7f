package graft
// (sharedSpans tests appended at the bottom of this suite)

import org.apache.spark.sql.functions._

import graft.analysis.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "a"),
    (1L, "the quick brown fox jumps over the lazy dog", "a"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat", "a"), // near dup
    (3L, "completely different text about spark shuffles", "a"),
    (4L, "zzz yyy xxx www vvv uuu ttt sss", "b"))
    .toDF("doc_id", "text", "source")

  test("exact dedup keeps min id and counts members") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.length == 4)
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 2L) // 0+1 merged
  }

  test("exactDropped returns the non-representative rows") {
    val dropped = Dedup.exactDropped(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0))
    assert(dropped.toSeq == Seq(1L))
  }

  test("ngram jaccard finds the near-dup pair, not the unrelated one") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 5, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard prefix filter is EXACT: pairs match the all-pairs filter") {
    // many short docs over a small vocabulary → dense similarity spectrum,
    // including pairs whose only shared shingles sit deep in one doc's
    // sorted hash order (the case a naive one-sided prefix would miss)
    val words = Vector("aaaa", "bbbb", "cccc", "dddd", "eeee", "ffff", "gggg")
    val rnd = new scala.util.Random(23)
    val many = (0L until 30L).map { i =>
      (i, Seq.fill(4 + rnd.nextInt(4))(words(rnd.nextInt(words.size))).mkString(" "), "g")
    }.toDF("doc_id", "text", "source")
    val filtered = Dedup.ngramJaccardPairs(many, "doc_id", "text", "source", 5, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force: all pairs over the same sorted shingle-hash sets
    val sets = many.select(col("doc_id"), Dedup.shinglesHashes(col("text"), 5).as("ss"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = (sets(a) & sets(b)).size
      j = BigDecimal(i.toDouble / (sets(a).size + sets(b).size - i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= 0.5
    } yield (a, b, j)).toSet
    assert(filtered == brute)
    assert(brute.nonEmpty) // the fixture actually exercises the operator
  }

  test("minhash LSH candidates include exact and near dups") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text", 5, 32, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L))) // identical text always collides
    assert(!cands.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical texts get identical fingerprints; hamming near for near-dups") {
    val fps = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(0L) == fps(1L))
    val hammingNear = java.lang.Long.bitCount(fps(0L) ^ fps(2L))
    val hammingFar = java.lang.Long.bitCount(fps(0L) ^ fps(4L))
    assert(hammingNear < hammingFar)
  }

  test("embedding near-dup finds high-cosine pair within block") {
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f), 0), (1L, Seq(0.99f, 0.1f, 0f), 0),
      (2L, Seq(0f, 1f, 0f), 0), (3L, Seq(1f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingNearDup(emb, "vec_id", "embedding", col("label"), 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L))) // 0-3 same vector but different label-block
  }

  test("simhash pigeonhole banding is EXACT: pairs match the brute-force all-pairs filter") {
    // 40 docs with overlapping token sets → a spread of Hamming distances
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rnd = new scala.util.Random(11)
    val many = (0L until 40L).map { i =>
      (i, Seq.fill(8)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val banded = Dedup.simhashPairs(many, "doc_id", "text", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fps = many.select(col("doc_id"), Dedup.simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- fps.keys; b <- fps.keys if a < b
      d = java.lang.Long.bitCount(fps(a) ^ fps(b)) if d <= 6
    } yield (a, b, d.toLong)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty) // the fixture actually exercises the operator
  }

  test("ngram jaccard stays EXACT when the hot band dominates (tiny hotCap)") {
    // hotCap=2 forces most shingles into the hot band → prefixes draw
    // from the hot fallback; exactness must hold for ANY band split
    val words = Vector("aaaa", "bbbb", "cccc", "dddd", "eeee")
    val rnd = new scala.util.Random(7)
    val many = (0L until 25L).map { i =>
      (i, Seq.fill(4 + rnd.nextInt(3))(words(rnd.nextInt(words.size))).mkString(" "), "g")
    }.toDF("doc_id", "text", "source")
    val sets = many.select(col("doc_id"), Dedup.shinglesHashes(col("text"), 5).as("ss"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = (sets(a) & sets(b)).size
      j = BigDecimal(i.toDouble / (sets(a).size + sets(b).size - i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= 0.5
    } yield (a, b, j)).toSet
    for (cap <- Seq(1, 2, 1000)) {
      val got = Dedup.ngramJaccardPairs(many, "doc_id", "text", "source", 5, 0.5, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == brute, s"hotCap=$cap")
    }
    assert(brute.nonEmpty)
  }

  test("components: empty pair set yields empty labels, no throw") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.components(empty, "id_a", "id_b").count() == 0)
  }

  test("components: chains collapse to min id, clusters stay separate, log-depth converges") {
    // chain 0-1-2-3-4 (diameter 4), separate cluster {10,11}, pair order mixed
    val pairs = Seq((1L, 0L), (1L, 2L), (3L, 2L), (3L, 4L), (11L, 10L))
      .toDF("id_a", "id_b")
    val comp = Dedup.components(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 4L).forall(comp(_) == 0L))
    assert(comp(10L) == 0L + 10L && comp(11L) == 10L)
    // a long chain converges within the default rounds (pointer jumping)
    val chain = (0L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val chainComp = Dedup.components(chain, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chainComp.values.forall(_ == 0L) && chainComp.size == 65)
  }

  test("minhashJaccardPairs rerank scores candidates exactly and keeps obvious dups") {
    val pairs = Dedup.minhashJaccardPairs(docs, "doc_id", "text", 5, 32, 8, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = pairs.find(p => p._1 == 0L && p._2 == 1L)
    assert(exact.exists(_._3 == 1.0)) // identical texts: jaccard exactly 1
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("componentWeights: weight = 1/|component|, singletons weigh 1, total mass = #components") {
    val ids = Seq(0L, 1L, 2L, 3L, 10L, 11L, 42L).toDF("doc_id")
    // chain 0-1-2-3 (one component of 4, incl. transitively-only 0~3),
    // pair 10-11, singleton 42 never appears in a pair
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.componentWeights(ids, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.size == 7)
    for (i <- Seq(0L, 1L, 2L, 3L)) assert(out(i) == (0L, 4L, 0.25))
    for (i <- Seq(10L, 11L)) assert(out(i) == (10L, 2L, 0.5))
    assert(out(42L) == (42L, 1L, 1.0))
    // the invariant the reweighting exists for: duplicated content
    // carries total mass 1, so Σ weights = #distinct contents
    assert(math.abs(out.values.map(_._3).sum - 3.0) < 1e-9)
  }

  test("plantedDupEval: exact copies recover fully; hostile config reports honest zero") {
    import spark.implicits._
    // long repetitive-ish sentences so shingle sets are rich; with
    // dropEvery far beyond the token count the plants are EXACT
    // copies -> jaccard 1.0 on every planted pair -> recall 1
    val docs = (0L until 5L).map(i =>
      (i, s"document number $i talks about spark joins shuffles and windows " +
        s"in considerable repetitive detail variant $i")).toDF("doc_id", "text")
    val full = Dedup.plantedDupEval(docs, "doc_id", "text",
      nPlants = 3L, dropEvery = 1000, idOffset = 100L,
      k = 5, numHashes = 32, rowsPerBand = 8, threshold = 0.5).head()
    assert(full.getLong(0) == 3L && full.getLong(1) == 3L, s"got $full")
    assert(full.getDouble(2) == 1.0 && full.getDouble(3) == 1.0, s"got $full")
    // threshold above 1 keeps nothing: the report must still produce
    // its row, with recall 0 and the -1 sentinel
    val none = Dedup.plantedDupEval(docs, "doc_id", "text",
      nPlants = 3L, dropEvery = 1000, idOffset = 100L,
      k = 5, numHashes = 32, rowsPerBand = 8, threshold = 1.1).head()
    assert(none.getLong(1) == 0L && none.getDouble(2) == 0.0 &&
      none.getDouble(3) == -1.0, s"got $none")
  }

  test("dupNgramFrac: shared runs count, unique text scores 0, fractions are per-doc") {
    import spark.implicits._
    // docs 1 and 2 share the 4-token run "p1 p2 p3 p4" → with n=3 the
    // shared trigrams are (p1,p2,p3) and (p2,p3,p4)
    val docs = Seq(
      (1L, "a1 a2 p1 p2 p3 p4"),   // trigrams: 4 total, 2 shared
      (2L, "p1 p2 p3 p4 b1 b2"),   // 4 total, 2 shared
      (3L, "c1 c2 c3 c4 c5")       // 3 total, none shared
    ).toDF("doc_id", "text")
    val out = Dedup.dupNgramFrac(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) == ((4L, 2L, 0.5)), s"got ${out(1L)}")
    assert(out(2L) == ((4L, 2L, 0.5)), s"got ${out(2L)}")
    assert(out(3L) == ((3L, 0L, 0.0)), s"got ${out(3L)}")
  }

  test("sharedSpans: longest shared token run via diagonal islands") {
    import spark.implicits._
    // docs 1/2 share the 10-token run w1..w10 at different offsets;
    // docs 1/4 additionally share the 5-token run w1..w5 — the max
    // must pick the longest run per pair, not the first
    val run10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $run10 a3"),
      (2L, s"b1 $run10 b2 b3"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),
      (4L, s"w1 w2 w3 w4 w5 d1 d2 d3 d4")
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpans(docs, "doc_id", "text",
        n = 3, maxDf = 4, minSpan = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) == 10L, s"got $out")
    assert(out((1L, 4L)) == 5L && out((2L, 4L)) == 5L, s"got $out")
    assert(!out.contains((1L, 3L)) && !out.contains((2L, 3L)),
      "disjoint docs never pair")
    // minSpan above the longest run silences the pair entirely
    val strict = Dedup.sharedSpans(docs, "doc_id", "text",
        n = 3, maxDf = 4, minSpan = 11)
      .collect()
    assert(strict.isEmpty, s"no run reaches 11 tokens: ${strict.toSeq}")
    // df filter: a gram shared by every doc is boilerplate and must
    // not link anything at maxDf = 1
    val all = Dedup.sharedSpans(docs, "doc_id", "text",
        n = 3, maxDf = 1, minSpan = 3)
      .collect()
    assert(all.isEmpty, "df-filtered grams cannot seed any pair")
  }

  test("gram store: deltaSharedSpans ≡ batch restricted to the delta; append extends it") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a w1 w2 w3 w4 w5 w6 b"),
      (2L, "w3 w4 w5 w6 w7 w8 c d"),
      (3L, "q r s t u v")).toDF("doc_id", "text")
    val delta = Seq(
      (11L, "e w1 w2 w3 w4 w5 w6 w7 w8 f"),
      (12L, "k l m n o p")).toDF("doc_id", "text")
    val store = java.nio.file.Files.createTempDirectory("graft-gramstore")
      .toString + "/store"
    Dedup.writeGramStore(corpus, "doc_id", "text", n = 3, store, buckets = 8)
    val got = Dedup.deltaSharedSpans(delta, "doc_id", "text", store,
        maxDf = 4, minSpan = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val want = Dedup.sharedSpans(corpus.unionByName(delta), "doc_id", "text",
        n = 3, maxDf = 4, minSpan = 4)
      .filter(col("id_b") >= 11L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == want && got.nonEmpty, s"delta $got vs batch-restricted $want")
    // append: a later batch finds spans against the FIRST delta too
    Dedup.appendToGramStore(delta, "doc_id", "text", store)
    val later = Seq((21L, "z e w1 w2 w3 w4 w5 y")).toDF("doc_id", "text")
    val got2m = Dedup.deltaSharedSpans(later, "doc_id", "text", store,
        maxDf = 5, minSpan = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got2m.contains((11L, 21L)),
      s"appended doc 11 must be a span target: $got2m")
    // doc 21 shares "e w1 w2 w3 w4 w5" (6 tokens) with the appended 11
    assert(got2m((11L, 21L)) == 6L, s"shared e+w1..w5 run: $got2m")
  }

  test("removeSharedSpans: min-id-wins cuts, overlapping cuts merge") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a w1 w2 w3 w4 w5 w6 b"),
      (2L, "w3 w4 w5 w6 w7 w8 c d"),
      (3L, "e w1 w2 w3 w4 w5 w6 w7 w8 f")
    ).toDF("doc_id", "text")
    val out = Dedup.removeSharedSpans(docs, "doc_id", "text",
        n = 3, maxDf = 4, minSpan = 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 1 is the lowest id of every pair it joins — untouched
    assert(out(1L) == (("a w1 w2 w3 w4 w5 w6 b", 0L)), s"got ${out(1L)}")
    // doc 2 loses its shared w3..w6 run against doc 1
    assert(out(2L) == (("w7 w8 c d", 4L)), s"got ${out(2L)}")
    // doc 3's cuts from doc 1 ([1,7) — w1..w6) and doc 2 ([3,9) —
    // w3..w8) OVERLAP and must merge to [1,9): w1..w8 all removed once
    assert(out(3L) == (("e f", 8L)), s"got ${out(3L)}")
  }
}
