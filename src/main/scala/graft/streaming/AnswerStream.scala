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

  /** `idleTimeout` bounds TOTAL state: an answer idle that long is
    * considered complete and its state removed — without expiry the
    * number of retained keys grows with every answer ever streamed.
    * Pass None to disable expiry (finite/test streams, where
    * processing-time timeouts would keep the trigger loop spinning). */
  def accumulate(spark: SparkSession, tokens: Dataset[Token],
                 idleTimeout: Option[String] = Some("30 minutes")): Dataset[RunningAnswer] = {
    import spark.implicits._
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    tokens
      .groupByKey(_.answerId)
      .mapGroupsWithState(timeoutConf) {
        (id: Long, batch: Iterator[Token], state: GroupState[String]) =>
          if (state.hasTimedOut) {
            val finalText = state.getOption.getOrElse("")
            state.remove()
            RunningAnswer(id, finalText)
          } else {
            val appended = batch.toSeq.sortBy(_.seq).map(_.token).mkString
            val acc = state.getOption.getOrElse("") + appended
            state.update(acc)
            idleTimeout.foreach(state.setTimeoutDuration)
            RunningAnswer(id, acc)
          }
      }
  }

  /** Update-mode memory sink helper for tests/demos. */
  def toMemorySink(ds: Dataset[RunningAnswer], name: String) =
    ds.writeStream.outputMode(OutputMode.Update()).format("memory").queryName(name)
}
