package graft

import org.apache.spark.sql.functions._

import graft.embed.Featurizer
import graft.model.{ChatMessage, Chunk, Model}
import graft.text.Chunker

class ModelSpec extends SparkSpec {
  import spark.implicits._

  test("typed Chunk dataset round-trips through the ingest pipeline") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(20)
    val ch = Chunker.withOrdinalIds(
      Chunker.chunk(docs, "text", 100, 20).filter(Chunker.nonEmpty(col("chunk"))),
      "doc_id")
    val typed = Model.chunks(spark, ch.select(
      col("chunk_id").as("id"), col("chunk").as("text"),
      transform(Featurizer.featurize(16)(col("chunk")), x => x.cast("float"))
        .as("embedding")))
    val rows: Array[Chunk] = typed.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.embedding.length == 16))
    assert(rows.map(_.id).sorted.toSeq == (0L until rows.length).toSeq) // dense
  }

  test("ChatMessage enforces the role union (types.ts:9)") {
    assert(ChatMessage("user", "hi").role == "user")
    intercept[IllegalArgumentException](ChatMessage("system", "no"))
  }
}
