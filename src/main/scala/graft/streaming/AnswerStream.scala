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

  /** Per-answer accumulator state: `acc` is the contiguous prefix
    * (tokens 0 until `next` already appended), `pending` buffers tokens
    * that arrived AHEAD of a gap — so a token delayed across micro-batch
    * boundaries slots in where it belongs instead of corrupting the
    * answer (text only ever appends once its predecessors are in).
    * `pending` is bounded by the answer's own out-of-order window, not
    * by stream length; duplicates (seq < next or already buffered) are
    * dropped idempotently. */
  case class AnswerState(next: Int, acc: String, pending: Map[Int, String])

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
        (id: Long, batch: Iterator[Token], state: GroupState[AnswerState]) =>
          if (state.hasTimedOut) {
            val finalText = state.getOption.map(_.acc).getOrElse("")
            state.remove()
            RunningAnswer(id, finalText)
          } else {
            val st0 = state.getOption.getOrElse(AnswerState(0, "", Map.empty))
            // buffer this batch's new tokens (idempotent on duplicates)
            val pending = batch.foldLeft(st0.pending) { (p, t) =>
              if (t.seq < st0.next || p.contains(t.seq)) p else p + (t.seq -> t.token)
            }
            // drain the now-contiguous run past the gap front
            var next = st0.next
            val sb = new StringBuilder(st0.acc)
            var rest = pending
            while (rest.contains(next)) {
              sb.append(rest(next))
              rest -= next
              next += 1
            }
            val st = AnswerState(next, sb.toString, rest)
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            RunningAnswer(id, st.acc)
          }
      }
  }

  /** Update-mode memory sink helper for tests/demos. */
  def toMemorySink(ds: Dataset[RunningAnswer], name: String) =
    ds.writeStream.outputMode(OutputMode.Update()).format("memory").queryName(name)
}
