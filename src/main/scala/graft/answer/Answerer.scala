package graft.answer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.Featurizer
import graft.io.Tables
import graft.search.Search
import graft.vector.VectorOps

/** Answer generation — the pluggable boundary where the reference calls
  * `gemini-2.5-flash` (`/root/reference/services/geminiService.ts:91-98`).
  * The LLM itself is out of engine scope (external service; zero-egress
  * here); the engine owns everything up to and including the prompt, plus
  * this interface. `TemplateAnswerer` is the deterministic stub: it
  * derives the answer from the retrieved context alone, so the full
  * ask() pipeline stays oracle-verifiable end to end.
  */
trait Answerer extends Serializable {
  /** Map a column of prompts to a column of answers. */
  def answer(prompt: Column, question: Column, context: Column): Column
}

/** Deterministic stub: surfaces the top retrieved chunk and the corpus
  * coverage — pure Column ops, no external calls. */
object TemplateAnswerer extends Answerer {
  override def answer(prompt: Column, question: Column, context: Column): Column =
    format_string(
      "Q: %s | top context: %s | context chars: %d",
      question,
      substring(split(context, "\n---\n").getItem(0), 1, 80),
      length(context))
}

object Ask {
  /** The full `handleSendMessage` pipeline (`App.tsx:180-224`): embed the
    * question, retrieve top-k over the featurized corpus, assemble
    * context + prompt, generate the answer. One DataFrame in, one
    * 1-row DataFrame (question, context, prompt, answer) out. */
  def ask(spark: SparkSession, dir: String, question: String, k: Int = 5,
          dim: Int = Featurizer.DefaultDim,
          answerer: Answerer = TemplateAnswerer): DataFrame = {
    import spark.implicits._
    val qdf = Seq(Tuple1(Featurizer.featurizeCountsText(question, dim))).toDF("qvec")
    val corpus = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        Featurizer.featurizeCounts(dim)(col("text")).as("dvec"))
    // one knn implementation owns the total-order contract (sim DESC, id ASC)
    val top = Search.knn(corpus, qdf, k, idCol = "doc_id", vecCol = "dvec")
    Search.contextAgg(top, col("doc_id"), col("text"), col("sim"))
      .select(lit(question).as("question"), col("context"),
        Search.prompt(col("context"), lit(question)).as("prompt"))
      .withColumn("answer",
        answerer.answer(col("prompt"), col("question"), col("context")))
  }
}
