package graft

import org.apache.spark.sql.functions._

import graft.analysis.Dedup

/** The single-pass shingle hasher must match the composed-HOF
  * specification bit-for-bit on real document text. */
class ShingleHashesSpec extends SparkSpec {

  test("native == HOF on sf0.001 documents (k=5 and k=3)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(100)
    Seq(3, 5).foreach { k =>
      val diff = docs.select(
          Dedup.shinglesHashes(col("text"), k).as("fast"),
          Dedup.shinglesHashesHof(col("text"), k).as("spec"))
        .filter(col("fast") =!= col("spec"))
      assert(diff.count() == 0, s"mismatch at k=$k")
    }
  }

  test("empty string matches the HOF spec (one empty-shingle hash)") {
    import spark.implicits._
    val row = Seq("").toDF("text").select(
      Dedup.shinglesHashes(col("text"), 5).as("fast"),
      Dedup.shinglesHashesHof(col("text"), 5).as("spec")).head()
    assert(row.getSeq[Long](0) == row.getSeq[Long](1))
    assert(row.getSeq[Long](0) == Seq(217L)) // (7·31 + ascii("")) mod p
  }

  test("short text (< k) hashes its single truncated shingle") {
    import spark.implicits._
    val out = Seq("ab").toDF("text")
      .select(Dedup.shinglesHashes(col("text"), 5).as("h"))
      .head().getSeq[Long](0)
    assert(out.length == 1)
    // fold: ((7*31+'a') mod p)*31 + 'b' mod p
    val expect = ((7L * 31 + 'a') % 1000000007L * 31 + 'b') % 1000000007L
    assert(out.head == expect)
  }

  test("non-BMP text: native kernels match HOF spec (codepoint folding)") {
    import spark.implicits._
    // U+1F600 is a surrogate pair in UTF-16; SQL ascii()/substring are
    // codepoint-based, so the native kernels must fold codepoints
    val texts = Seq("hi 😀 there", "😀😁 café", "ascii only text")
    val df = texts.toDF("text")
    val sh = df.select(
      Dedup.shinglesHashes(col("text"), 3).as("fast"),
      Dedup.shinglesHashesHof(col("text"), 3).as("spec"))
      .filter(col("fast") =!= col("spec"))
    assert(sh.count() == 0)
    val sim = df.select(
      Dedup.simhash64(col("text")).as("fast"),
      Dedup.simhash64Hof(col("text")).as("spec"))
      .filter(col("fast") =!= col("spec"))
    assert(sim.count() == 0)
  }

  test("tokenHash folds codepoints (supplementary plane)") {
    // "😀" = U+1F600: hash must be (7·31 + 128512) mod p, one term
    val expect = (7L * 31 + 0x1F600) % 1000000007L
    assert(graft.embed.Featurizer.tokenHash("😀") == expect)
  }

  test("simhash64 native == HOF spec on sf0.001 documents") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(100)
    val diff = docs.select(
        Dedup.simhash64(col("text")).as("fast"),
        Dedup.simhash64Hof(col("text")).as("spec"))
      .filter(col("fast") =!= col("spec"))
    assert(diff.count() == 0)
  }

  test("output is sorted and distinct") {
    import spark.implicits._
    val out = Seq("aaaaaaaaaa").toDF("text") // all shingles identical
      .select(Dedup.shinglesHashes(col("text"), 5).as("h"))
      .head().getSeq[Long](0)
    assert(out.length == 1)
  }
}
