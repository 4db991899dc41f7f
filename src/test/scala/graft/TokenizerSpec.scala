package graft

import org.apache.spark.sql.functions._

import graft.text.Tokenizer

/** The tokenizer STORE (the seventh maintenance family): the
  * fertility/OOV arithmetic against a hand lattice, the store
  * lifecycle (write → observe → drift → retrain), and the
  * coverage-floor consequence the after-check relies on (a retrain's
  * alphabet covers every observed char → OOV lands at exactly 0). */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("fertilityStats: hand-checked pieces, unks, and denominators") {
    // tokens: ab, ab, zz → 3; 'ab' segments to [ab] (1 piece ×2),
    // 'zz' has no trained 'z' → [<unk>, <unk>] (2 pieces ×1);
    // n_pieces 4, n_unk 2, fertility 4/3, oov 2/4
    val docs = Seq((0L, "ab ab zz")).toDF("doc_id", "text")
    val vocab = Seq(("a", 1L), ("b", 1L), ("ab", 4L)).toDF("piece", "cnt")
    val r = Tokenizer.fertilityStats(docs, "text", vocab, maxPieceLen = 2)
      .head()
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("n_pieces") == 4L)
    assert(r.getAs[Long]("n_unk") == 2L)
    assert(r.getAs[Double]("fertility") == 1.333333)
    assert(r.getAs[Double]("oov_rate") == 0.5)
  }

  test("store lifecycle: write → observe → drift fires on a mangled batch → retrain resolves OOV to exactly 0") {
    val docs = graft.io.Tables.documents(spark, sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft-tok").toString
    val path = s"$root/tok"
    Tokenizer.writeTokenizer(docs, "text", path)
    // clean batch: fertility ≈ baseline, no OOV
    val clean = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val d0 = Tokenizer.tokenizerDrift(spark, path, clean, "text").head()
    assert(d0.getAs[Double]("oov_rate") == 0.0)
    assert(math.abs(d0.getAs[Double]("drift")) < 0.2, d0.toString)
    // mangled batch: unseen words AND an unseen char
    val mangled = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 200000).as("doc_id"),
        translate(col("text"), "e", "#").as("text"))
    val d1 = Tokenizer.tokenizerDrift(spark, path, mangled, "text").head()
    assert(d1.getAs[Double]("oov_rate") > 0.01, d1.toString)
    assert(d1.getAs[Double]("drift") > 0.2, d1.toString)
    // observe + retrain: the fresh generation's alphabet covers '#',
    // so the SAME batch re-evaluates to OOV exactly 0
    Tokenizer.observeBatch(mangled, "text", path, 0L)
    Tokenizer.retrainTokenizer(spark, path, s"$root/tok2")
    val d2 = Tokenizer.tokenizerDrift(spark, s"$root/tok2",
      Tokenizer.lastSeenBatch(spark, s"$root/tok2"), "text").head()
    assert(d2.getAs[Double]("oov_rate") == 0.0, d2.toString)
    assert(spark.read.parquet(s"$root/tok2")
      .filter(col("piece") === "#").count() == 1)
    // the conf rides along: the retrained store can retrain again
    assert(spark.read.parquet(s"$root/tok2.conf").head()
      .getAs[Int]("vocab_size") == 120)
  }

  test("fleet planner: the tokenizer registers like any family, retrain priced at the observed row count") {
    val docs = graft.io.Tables.documents(spark, sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft-tokf").toString
    val path = s"$root/tok"
    Tokenizer.writeTokenizer(docs, "text", path)
    Tokenizer.observeBatch(
      docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 100000).as("doc_id"),
          translate(col("text"), "e", "#").as("text")),
      "text", path, 0L)
    val planned = graft.store.Maintenance.indexMaintainCosted(spark,
      tokenizer = Seq("tok" -> path)).collect()
    val nSeen = spark.read.parquet(s"$path.seen").count()
    assert(planned.nonEmpty, "the mangled batch must fire")
    planned.foreach { r =>
      assert(r.getAs[String]("index_kind") == "tokenizer")
      assert(r.getAs[String]("action") == "retrain")
      assert(r.getAs[Long]("cost_rows") == nSeen,
        s"retrain reads everything observed: $r vs $nSeen")
    }
    assert(planned.map(_.getAs[String]("signal")).toSet ==
      Set("fertility_drift", "oov_rate"))
  }

  test("compactSeen: the weighted-dictionary tail retrains to the IDENTICAL vocabulary and baseline; recent batches stay raw") {
    val docs = graft.io.Tables.documents(spark, sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft-tokc").toString
    def build(path: String): Unit = {
      Tokenizer.writeTokenizer(docs, "text", path)
      Tokenizer.observeBatch(
        docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 100000).as("doc_id"),
            translate(col("text"), "e", "#").as("text")), "text", path, 0L)
      Tokenizer.observeBatch(
        docs.filter(col("doc_id") >= 20 && col("doc_id") < 30)
          .select((col("doc_id") + 200000).as("doc_id"),
            translate(col("text"), "a", "@").as("text")), "text", path, 1L)
    }
    build(s"$root/raw"); build(s"$root/cmp")
    // compact everything below the most recent batch (build corpus +
    // batch 0 collapse to the weighted token dictionary)
    Tokenizer.compactSeen(spark, s"$root/cmp", keepFrom = 1L)
    val rawSeen = spark.read.parquet(s"$root/raw.seen")
    val cmpSeen = spark.read.parquet(s"$root/cmp.seen")
    assert(cmpSeen.count() < rawSeen.count(),
      "the dictionary tail must be smaller than the raw stream")
    // per-batch consumers: the retained raw batch is untouched
    assert(Tokenizer.lastSeenBatch(spark, s"$root/cmp")
      .agg(max(col("__batch"))).head().getLong(0) == 1L)
    assert(Tokenizer.lastSeenBatch(spark, s"$root/cmp").count() ==
      Tokenizer.lastSeenBatch(spark, s"$root/raw").count())
    // the token multiset is preserved exactly
    def multiset(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(explode(graft.text.TextAnalysis.tokens(col("text")))
          .as("t"), col("__w"))
        .groupBy("t").agg(sum(col("__w")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(multiset(cmpSeen) == multiset(rawSeen))
    // retrain from each: identical vocabulary, row for row, and the
    // identical fertility baseline
    Tokenizer.retrainTokenizer(spark, s"$root/raw", s"$root/raw2")
    Tokenizer.retrainTokenizer(spark, s"$root/cmp", s"$root/cmp2")
    def vocabOf(p: String): Seq[(String, Long, Double)] =
      spark.read.parquet(p).orderBy(col("cnt").desc, col("piece"))
        .collect()
        .map(r => (r.getAs[String]("piece"), r.getAs[Long]("cnt"),
          r.getAs[Double]("logp"))).toSeq
    assert(vocabOf(s"$root/raw2") == vocabOf(s"$root/cmp2"))
    assert(spark.read.parquet(s"$root/raw2.stats").head().getDouble(0) ==
      spark.read.parquet(s"$root/cmp2.stats").head().getDouble(0))
    // idempotent: a second compaction over the already-compacted tail
    // re-aggregates the same multiset
    Tokenizer.compactSeen(spark, s"$root/cmp", keepFrom = 1L)
    assert(multiset(spark.read.parquet(s"$root/cmp.seen")) ==
      multiset(rawSeen))
  }
}
