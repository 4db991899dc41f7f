package graft

import graft.analysis.SeqPack

/** Contiguous sequence packing: exact window assignment on crafted
  * weights; the distributed-prefix-sum plan property is guarded in
  * PlanShapeSpec. */
class SeqPackSpec extends SparkSpec {
  import spark.implicits._

  test("windows cut at capacity boundaries of the exclusive prefix sum") {
    val df = Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 10L), (4L, 1L))
      .toDF("id", "w")
    val out = SeqPack.packWindows(df, "id", "w", 5L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // cum-before: 0, 3, 6, 9, 19 → div 5 → 0, 0, 1, 1, 3
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 3L))
  }

  test("packing is deterministic and order-preserving across partitions") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", graft.text.TextAnalysis.tokenCount($"text").cast("long").as("w"))
    val a = SeqPack.packWindows(docs, "doc_id", "w", 512L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    val b = SeqPack.packWindows(docs.repartition(7), "doc_id", "w", 512L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b)) // input partitioning must not change windows
    // window ids are non-decreasing in doc order and start at 0
    assert(a.head._2 == 0L)
    assert(a.sliding(2).forall { case Array((_, w1), (_, w2)) => w1 <= w2 })
  }
}
