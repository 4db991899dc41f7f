package graft

import graft.text.LangModel

/** Hand-computed pin for the bigram-LM surprisal score. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("add-k bigram surprisal matches the closed-form micro model") {
    // corpus: "a b a b", "a b", "single"
    // unigrams: a:3 b:3 single:1 → V=3
    // bigrams: (a,b):3  (b,a):1
    // P(b|a) = (3+.5)/(3+.5*3) = 3.5/4.5 ; P(a|b) = (1+.5)/(3+1.5) = 1.5/4.5
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "single"))
      .toDF("doc_id", "text")
    val out = LangModel.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val nllAB = -math.log(3.5 / 4.5)
    val nllBA = -math.log(1.5 / 4.5)
    val exp1 = (2 * nllAB + nllBA) / 3
    assert(math.abs(out(1L) - exp1) < 1e-6, s"doc1 ${out(1L)} vs $exp1")
    assert(math.abs(out(2L) - nllAB) < 1e-6, s"doc2 ${out(2L)} vs $nllAB")
    assert(out(3L) == 0.0, "a 1-token doc has no bigrams and scores 0")
  }

  test("Kneser-Ney surprisal matches the closed-form micro model") {
    // corpus: "a b a b", "a c"
    // bigrams: (a,b):2 (b,a):1 (a,c):1
    // context a: mass 3, fan-out 2; context b: mass 1, fan-out 1
    // continuation: a,b,c each follow 1 distinct context; T = 3
    // p(b|a) = (2−.75)/3 + .75·2/3·(1/3)
    // p(a|b) = (1−.75)/1 + .75·1/1·(1/3)
    // p(c|a) = (1−.75)/3 + .75·2/3·(1/3)
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = LangModel.knSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pBA = (2 - 0.75) / 3 + 0.75 * 2 / 3 * (1.0 / 3)
    val pAB = (1 - 0.75) / 1 + 0.75 * 1 / 1 * (1.0 / 3)
    val pCA = (1 - 0.75) / 3 + 0.75 * 2 / 3 * (1.0 / 3)
    val exp1 = -(2 * math.log(pBA) + math.log(pAB)) / 3
    assert(math.abs(out(1L) - exp1) < 1e-6, s"doc1 ${out(1L)} vs $exp1")
    assert(math.abs(out(2L) - (-math.log(pCA))) < 1e-6)
    assert(out(3L) == 0.0, "a 1-token doc has no bigrams and scores 0")
    // the continuation property: under KN a word following MANY
    // distinct contexts gets more continuation mass than an
    // equally-frequent word glued to one context
    assert(pBA > pCA)
  }

  test("perplexityBuckets: per-lang tertiles, head = cleanest third") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = LangModel.perplexityBuckets(docs, "doc_id", "text", "lang")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = docs.select(col("lang")).distinct()
      .collect().map(_.getString(0)).toSet
    // every language splits into 3 buckets of roughly equal mass
    langs.foreach { l =>
      val total = Seq("head", "middle", "tail").map(b => out.getOrElse((l, b), 0L))
      assert(total.sum > 0, s"lang $l missing from buckets")
      assert(total.forall(_ > 0), s"lang $l has an empty tertile: $total")
    }
    // head docs have lower surprisal than tail docs, by construction
    val scored = LangModel.knSurprisal(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val l0 = langs.head
    val cuts = scored.filter(col("lang") === l0)
      .agg(expr(s"percentile(surprisal, ${1.0 / 3})"),
        expr(s"percentile(surprisal, ${2.0 / 3})")).head()
    assert(cuts.getDouble(0) <= cuts.getDouble(1))
  }

  test("repetitious text scores lower surprisal than novel transitions") {
    // doc 1 repeats one transition; doc 2 is all fresh transitions of
    // the same length — the LM must find doc 1 more predictable
    val docs = Seq(
      (1L, "x y x y x y x y"),
      (2L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val out = LangModel.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) < out(2L), s"repetitive ${out(1L)} !< novel ${out(2L)}")
  }

  test("nbLangId learns separable vocabularies and scores the held-out half") {
    val train = Seq(
      (0L, "der hund und die katze", "de"),
      (2L, "und der baum der hund", "de"),
      (4L, "the dog and the cat", "en"),
      (6L, "the tree and a dog", "en"))
      .toDF("doc_id", "text", "lang")
    val test = Seq(
      (1L, "der hund", "de"),
      (3L, "die katze und der baum", "de"),
      (5L, "the cat and the dog", "en"))
      .toDF("doc_id", "text", "lang")
    val out = LangModel.nbLangId(train, test, "doc_id", "text", "lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(out.sorted == List(("de", 2L, 2L), ("en", 1L, 1L)),
      s"separable vocab must classify perfectly, got $out")
  }

  test("nbLangId: unseen tokens are ignored; empty-vocab doc falls to the prior") {
    val train = Seq(
      (0L, "aa bb", "de"),
      (2L, "cc dd", "en"),
      (4L, "cc ee", "en")) // en has the majority prior (2 of 3 docs)
      .toDF("doc_id", "text", "lang")
    val test = Seq(
      (1L, "zz qq ww", "de")) // every token unseen → prior-only → 'en'
      .toDF("doc_id", "text", "lang")
    val out = LangModel.nbLangId(train, test, "doc_id", "text", "lang")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(out == Map("de" -> 0L),
      "an all-unseen doc must fall back to the majority prior (en), scoring de wrong")
  }
}
