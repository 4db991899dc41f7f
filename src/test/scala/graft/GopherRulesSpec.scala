package graft

import graft.text.GopherRules

/** Hand fixtures for the two published rule-based curation gates:
  * every Gopher rule triggered individually, every C4 line-retention
  * clause exercised. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  test("gopher rules: each rule trips on its own violation fixture") {
    val good = (Seq.fill(20)("the quick brown fox jumps with vigor and") :+ "be")
      .mkString(" ") // 161 words, mean len ~4, has the/with/and/be
    val docs = Seq(
      (1L, good),
      (2L, "short text only"),                              // word count < 50
      (3L, Seq.fill(60)("a").mkString(" ")),                // mean word len 1 < 3
      (4L, (Seq.fill(60)("the word and") :+
        Seq.fill(30)("#").mkString(" ")).mkString(" ")),    // symbol ratio > 0.1
      (5L, ("the and with " + Seq.fill(60)("word").mkString(" ")).split(" ")
        .grouped(8).map("- " + _.mkString(" ")).mkString("\n")), // all bullet lines
      (6L, Seq.fill(60)("12345 67890").mkString(" ")),      // no alphabetic words
      (7L, Seq.fill(60)("zq xv wk").mkString(" ")))         // no stop words
      .toDF("doc_id", "text")
    val out = GopherRules.gopherQualityRules(docs, "doc_id", "text",
        minStopwords = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8)))
      .toMap
    assert(out(1L) == ((true, true, true, true, true, true, true, true)),
      s"the good doc must pass every rule: ${out(1L)}")
    assert(!out(2L)._1 && !out(2L)._8, "word count gate")
    assert(!out(3L)._2 && !out(3L)._8, "mean word length gate")
    assert(!out(4L)._3 && !out(4L)._8, "symbol ratio gate")
    assert(!out(5L)._4 && !out(5L)._8, "bullet line gate")
    assert(!out(6L)._6 && !out(6L)._8, "alphabetic word gate")
    assert(!out(7L)._7 && !out(7L)._8, "stop word gate")
  }

  test("c4 line cleaning: punctuation, word count, and marker clauses") {
    val docs = Seq(
      (1L, "this line ends with proper punctuation right here.\n" +
        "so does this one with plenty of words!\n" +
        "short one.\n" +                          // < 5 words → dropped
        "no terminal punctuation on this line\n" + // no punct → dropped
        "enable javascript to view this content.\n" + // marker → dropped
        "object { with braces } in this line.\n" +    // brace → dropped
        "lorem ipsum dolor sit amet filler text.")    // marker → dropped
    ).toDF("doc_id", "text")
    val stats = GopherRules.c4LineStats(docs, "doc_id", "text",
        minLineWords = 5, minKeptLines = 2)
      .head()
    assert(stats.getLong(1) == 7L && stats.getLong(2) == 2L && stats.getBoolean(3),
      s"got ${stats.toSeq}")
    val cleaned = GopherRules.c4CleanText(docs, "doc_id", "text",
        minLineWords = 5, minKeptLines = 2)
      .head().getString(1)
    assert(cleaned ==
      "this line ends with proper punctuation right here.\n" +
        "so does this one with plenty of words!",
      s"cleaned text keeps surviving lines in order: $cleaned")
    // below the keep threshold the document empties
    val dropped = GopherRules.c4CleanText(docs, "doc_id", "text",
        minLineWords = 5, minKeptLines = 3)
      .head().getString(1)
    assert(dropped == "", "failing the doc gate yields the empty drop marker")
  }
}
