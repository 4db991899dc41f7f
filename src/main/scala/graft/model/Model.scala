package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed data model — the Dataset mirror of the reference's row types
  * (SURVEY §1.3).
  *
  * `Chunk` ⇔ `DocumentChunk { id, text, embedding }`
  * (`/root/reference/types.ts:2-6`): dense 0-based id, chunk text, and
  * its embedding vector. `ChatMessage` ⇔ `types.ts:8-11`.
  *
  * The untyped DataFrame API remains the workhorse (schemas stay
  * dynamic through the operator pipeline); the typed views are for
  * call sites that want compile-time field checks.
  */
case class Chunk(id: Long, text: String, embedding: Array[Float])

case class Document(doc_id: Long, text: String, lang: String,
                    source: String, n_chars: Long)

case class ChatMessage(role: String, content: String) {
  require(role == "user" || role == "assistant",
    s"role must be user|assistant (types.ts:9), got $role") // check constraint
}

object Model {
  def chunks(spark: SparkSession, df: DataFrame): Dataset[Chunk] = {
    import spark.implicits._
    df.select($"id", $"text", $"embedding").as[Chunk]
  }

  def documents(spark: SparkSession, df: DataFrame): Dataset[Document] = {
    import spark.implicits._
    df.as[Document]
  }
}
