package graft

import org.apache.spark.sql.functions._

import graft.text.Chunker

/** Chunker boundary cases from the reference stride loop
  * (`/root/reference/App.tsx:56-61`, `constants.ts:9-10`; FIXTURES.md §B). */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("chunkerExact: 2600 chars, size 1000 / overlap 200 → offsets 0,800,1600,2400; last chunk 200") {
    val text = "x" * 2600
    val out = Chunker.chunk(Seq((1L, text)).toDF("doc_id", "text"), "text", 1000, 200)
      .select("pos", "chunk").collect().map(r => (r.getInt(0), r.getString(1).length))
    assert(out.map(_._1).toSeq == Seq(0, 800, 1600, 2400))
    assert(out.map(_._2).toSeq == Seq(1000, 1000, 1000, 200))
  }

  test("chunkerShort: 10-char text → one full-text chunk") {
    val out = Chunker.chunk(Seq((1L, "0123456789")).toDF("doc_id", "text"), "text", 1000, 200)
      .select("pos", "chunk").collect()
    assert(out.length == 1 && out(0).getInt(0) == 0 && out(0).getString(1) == "0123456789")
  }

  test("chunkerExactMultiple: length == stride·k keeps the overlap tail chunk") {
    // 1600 chars: offsets 0, 800 — second chunk is the 800-char tail
    val out = Chunker.chunk(Seq((1L, "y" * 1600)).toDF("doc_id", "text"), "text", 1000, 200)
      .select("pos", "chunk").collect().map(r => (r.getInt(0), r.getString(1).length))
    assert(out.toSeq == Seq((0, 1000), (800, 800)))
  }

  test("chunkerEmpty: empty text → zero chunks (the reference loop runs 0 times)") {
    val out = Chunker.chunk(Seq((1L, "")).toDF("doc_id", "text"), "text", 1000, 200)
    assert(out.count() == 0)
  }

  test("chunker rejects negative overlap (stride > size would skip chars)") {
    intercept[IllegalArgumentException] {
      Chunker.chunk(Seq((1L, "abc")).toDF("doc_id", "text"), "text", 1000, -5)
    }
  }

  test("chunkerBlank: whitespace-only text filtered out entirely (App.tsx:61)") {
    val out = Chunker.chunk(Seq((1L, " " * 50)).toDF("doc_id", "text"), "text", 1000, 200)
      .filter(Chunker.nonEmpty(col("chunk")))
    assert(out.count() == 0)
  }

  test("property: every char covered; consecutive chunks overlap exactly `overlap` except tail (seeded)") {
    val rnd = new scala.util.Random(7)
    val lens = Seq(1, 799, 800, 801, 999, 1000, 1001, 1600, 2600) ++
      Seq.fill(10)(1 + rnd.nextInt(5000))
    val docs = lens.zipWithIndex.map { case (n, i) => (i.toLong, "x" * n) }
      .toDF("doc_id", "text")
    val rows = Chunker.chunk(docs, "text", 1000, 200)
      .select("doc_id", "pos", "chunk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1)
    lens.zipWithIndex.foreach { case (n, i) =>
      val chunks = rows(i.toLong).sortBy(_._2)
      // coverage: chunk windows tile [0, n)
      val covered = chunks.flatMap { case (_, p, c) => p until (p + c.length) }.toSet
      assert(covered == (0 until n).toSet, s"coverage gap for len $n")
      // stride: consecutive offsets differ by exactly size-overlap=800
      chunks.map(_._2).sliding(2).foreach {
        case Array(a, b) => assert(b - a == 800, s"stride break at len $n")
        case _ =>
      }
      // every chunk is clamped by text end: len == min(size, n - pos)
      chunks.foreach { case (_, p, c) =>
        assert(c.length == math.min(1000, n - p), s"bad clamp at len $n pos $p")
      }
    }
  }

  test("reassemble: exact round trip for varied lengths incl. a tail chunk shorter than the overlap") {
    val rnd = new scala.util.Random(11)
    def randText(n: Int): String =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // 810 → tail chunk at pos 800 has 10 chars ≤ overlap 200 (fully
    // covered by the previous window; must contribute '' not garbage);
    // 800 → no tail; 1 → single tiny chunk; plus random lengths
    val lens = Seq(1, 799, 800, 801, 810, 1000, 1600, 2600) ++
      Seq.fill(6)(1 + rnd.nextInt(4000))
    val docs = lens.zipWithIndex.map { case (n, i) => (i.toLong, randText(n)) }
    val ch = Chunker.chunk(docs.toDF("doc_id", "text"), "text", 1000, 200)
      .select(col("doc_id"), col("pos"), col("chunk"))
    val out = Chunker.reassemble(ch, "doc_id", 200)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    docs.foreach { case (id, text) =>
      assert(out(id) == text, s"round trip broke for doc $id len ${text.length}")
    }
  }

  test("reassemble: n_chunks matches the chunk count and empty docs are simply absent") {
    val docs = Seq((1L, "z" * 1700), (2L, "")).toDF("doc_id", "text")
    val ch = Chunker.chunk(docs, "text", 1000, 200)
      .select(col("doc_id"), col("pos"), col("chunk"))
    val out = Chunker.reassemble(ch, "doc_id", 200)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 3L)) // offsets 0, 800, 1600; doc 2 chunked to nothing
  }

  test("ordinalIds: dense 0-based ids in (doc, pos) order across docs (App.tsx:72-76)") {
    val docs = Seq((2L, "b" * 1700), (1L, "a" * 700), (3L, "c" * 100 + " " * 900))
      .toDF("doc_id", "text")
    val ch = Chunker.chunk(docs, "text", 1000, 200)
      .filter(Chunker.nonEmpty(col("chunk")))
    val ids = Chunker.withOrdinalIds(ch, "doc_id")
      .orderBy("doc_id", "pos")
      .select("doc_id", "pos", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // doc 1: 1 chunk; doc 2: 3 chunks (0,800,1600); doc 3: blank chunk at
    // 800 dropped, chunk at 0 survives → ids stay dense across the gap
    assert(ids.toSeq == Seq(
      (1L, 0, 0L), (2L, 0, 1L), (2L, 800, 2L), (2L, 1600, 3L), (3L, 0, 4L)))
  }

  test("tokenChunk: sliding token windows, short tail, empty docs dropped") {
    import graft.text.Chunker
    val docs = Seq((1L, "a b  c d e"), (2L, "x"), (3L, "   "), (4L, ""))
      .toDF("doc_id", "text")
    val got = Chunker.tokenChunk(docs, "doc_id", "text", 3, 1)
      .orderBy(col("doc_id"), col("chunk_idx")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq(
      (1L, 0L, 3L, "a b c"), (1L, 1L, 3L, "c d e"), (1L, 2L, 1L, "e"),
      (2L, 0L, 1L, "x")), s"got $got")
  }
}
