package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streamed-answer accumulation — the reference consumes an async token
  * stream and appends each chunk to the growing assistant message
  * (`/root/reference/App.tsx:199-206`, fed by `generateContentStream`,
  * `geminiService.ts:91-98`). Here the same running-concat state machine
  * is a `mapGroupsWithState` over a token stream keyed by answer id:
  * per-key state is the accumulated answer, each micro-batch appends its
  * (seq-ordered) tokens and emits the updated text.
  *
  * Scale: state is per-answer-id and bounded by answer length; Spark
  * shards state by key across executors, checkpointed for recovery.
  */
object AnswerStream {

  case class Token(answerId: Long, seq: Int, token: String)
  case class RunningAnswer(answerId: Long, answer: String)

  def accumulate(spark: SparkSession, tokens: Dataset[Token]): Dataset[RunningAnswer] = {
    import spark.implicits._
    tokens
      .groupByKey(_.answerId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (id: Long, batch: Iterator[Token], state: GroupState[String]) =>
          val appended = batch.toSeq.sortBy(_.seq).map(_.token).mkString
          val acc = state.getOption.getOrElse("") + appended
          state.update(acc)
          RunningAnswer(id, acc)
      }
  }

  /** Update-mode memory sink helper for tests/demos. */
  def toMemorySink(ds: Dataset[RunningAnswer], name: String) =
    ds.writeStream.outputMode(OutputMode.Update()).format("memory").queryName(name)
}
