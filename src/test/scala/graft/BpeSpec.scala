package graft

import graft.text.Bpe

/** BPE merge training against hand-computed fixtures: the exact merge
  * sequence (frequency-weighted argmax with the (count DESC, pair ASC)
  * tie-break), greedy non-overlapping merge application, and merges
  * composing on earlier merges' output symbols. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge sequence matches the hand computation on a closed-form dict") {
    // dict: "aaab" x2, "ab" x1
    // iter1: (a,a)=4 (two per "aaab" occurrence), (a,b)=3 -> merge (a,a)
    // iter2: "aaab"->|aa|a|b|: (aa,a)=2, (a,b)=2+1=3      -> merge (a,b)
    // iter3: "aaab"->|aa|ab|:  (aa,ab)=2                  -> merge (aa,ab)
    val docs = Seq("aaab aaab ab").toDF("text")
    val got = Bpe.merges(docs, "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "a", "a", 4L), (2L, "a", "b", 3L),
      (3L, "aa", "ab", 2L)), s"got ${got.toSeq}")
  }

  test("merge application is greedy non-overlapping left-to-right") {
    // "aaaa": iter1 merges (a,a) [3 adjacent pairs], applied
    // left-to-right non-overlapping -> |aa|aa| (NOT |aaa|a| or |aaaa|);
    // iter2 must therefore see exactly one (aa,aa) pair.
    val got = Bpe.merges(Seq("aaaa").toDF("text"), "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)),
      s"got ${got.toSeq}")
  }

  test("runs out of pairs gracefully (fewer merges than requested)") {
    // "ab" has exactly one pair; after merging it the dict is a single
    // symbol per word and iteration 2 finds nothing.
    val got = Bpe.merges(Seq("ab ab").toDF("text"), "text", 5)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", "b", 2L)), s"got ${got.toSeq}")
  }

  test("ties break lexicographically on the pair string") {
    // "xy" and "ab" both have count 1; (a,b) sorts before (x,y)
    val got = Bpe.merges(Seq("xy ab").toDF("text"), "text", 1)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(("a", "b")), s"got ${got.toSeq}")
  }

  test("vocab after k merges is the rewritten dict's symbols, freq-weighted") {
    // "aaab" x2, "ab" x1 after 3 merges (see first test): "aaab" ->
    // |aaab| (merge 3 joined aa+ab), "ab" -> |ab|.
    // symbols: aaab x2, ab x1
    val got = Bpe.vocab(Seq("aaab aaab ab").toDF("text"), "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq(("aaab", 2L), ("ab", 1L)), s"got $got")
    // and with zero merges the vocab is the character alphabet
    val chars = Bpe.vocab(Seq("aaab aaab ab").toDF("text"), "text", 0)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(chars == Seq(("a", 7L), ("b", 3L)), s"got $chars")
  }

  test("native BpeEncode ≡ the chained applyMerge folds, including unseen words") {
    import org.apache.spark.sql.functions._
    // table learned on one corpus, applied to words the trainer never
    // saw (the ingest-time shape) — plus self-overlapping runs
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val words = Seq("aaab", "ab", "aaaa", "aaaaa", "ababab", "x", "", "bbaab",
      "aabab", "zaaabz").toDF("w")
    val composed = merges.foldLeft(
        graft.text.Bpe.piped(col("w"))) { case (acc, (l, r)) =>
        graft.text.Bpe.applyMerge(acc, l, r)
      }
    val got = words.select(
        col("w"),
        graft.functions.BpeEncode(col("w"), merges).as("fast"),
        filter(split(composed, "\\|"), t => length(t) > 0).as("spec"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"word '${r.getString(0)}': native ${r.getSeq[String](1)} vs spec ${r.getSeq[String](2)}")
    }
    // null word → NULL array
    val n = Seq(Tuple1[String](null)).toDF("w")
      .select(graft.functions.BpeEncode(col("w"), merges)).head()
    assert(n.isNullAt(0))
  }

  test("encodeSymbols: per-doc symbol counts with a trained table") {
    // train on the closed-form corpus, encode a NEW document
    val train = Seq("aaab aaab ab").toDF("text")
    val table = Bpe.mergeTable(train, "text", 3)
    assert(table == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    val docs = Seq((1L, "aaab ab aaaa"), (2L, "ba")).toDF("doc_id", "text")
    val got = Bpe.encodeSymbols(docs, "doc_id", "text", table)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    // doc 1: "aaab"→[aaab], "ab"→[ab], "aaaa"→[aa,aa]
    // doc 2: "ba"→[b,a] (no merge applies: (a,b) needs a then b)
    assert(got == Map((1L, "aaab") -> 1L, (1L, "ab") -> 1L, (1L, "aa") -> 2L,
      (2L, "b") -> 1L, (2L, "a") -> 1L), s"got $got")
  }

  test("incremental trainer ≡ the distributed iteration, merges and vocab") {
    // real corpus slice: the full sf0.001 documents table — mixed
    // languages, punctuation, self-overlapping runs
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = Bpe.merges(docs, "text", 10).orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val dist = Bpe.mergesDistributed(docs, "text", 10).orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(fast == dist, s"fast $fast\nvs dist $dist")
    val fv = Bpe.vocab(docs, "text", 6).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val dv = Bpe.vocabDistributed(docs, "text", 6).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(fv == dv, s"vocab sizes ${fv.size} vs ${dv.size}")
  }

  test("dict-size guard: merges/vocab identical across the local/distributed switch") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // maxLocalDictWords = 0 forces every call through the distributed
    // trainer; the default bound takes the incremental local path —
    // the guard must never change results, only the execution strategy
    val local = Bpe.merges(docs, "text", 8).orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val forced = Bpe.merges(docs, "text", 8, maxLocalDictWords = 0L).orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(local == forced, s"guard changed the merges: $local vs $forced")
    val lv = Bpe.vocab(docs, "text", 5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val fv = Bpe.vocab(docs, "text", 5, maxLocalDictWords = 0L).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(lv == fv, s"guard changed the vocab: ${lv.size} vs ${fv.size}")
  }

  test("applyMergeLocal ≡ the applyMerge column fold") {
    val words = Seq("aaaa", "abab", "ba", "a", "xaby", "abba")
    val (l, r) = ("a", "b")
    val viaCol = words.toDF("w")
      .select(Bpe.applyMerge(Bpe.piped(org.apache.spark.sql.functions.col("w")), l, r).as("s"))
      .collect().map(_.getString(0).split("\\|").filter(_.nonEmpty).toVector).toSeq
    val viaLocal = words.map(w =>
      Bpe.applyMergeLocal(w.map(_.toString).toVector, l, r))
    assert(viaCol == viaLocal, s"$viaCol vs $viaLocal")
  }
}
