package graft.embed

/** Error taxonomy + retry hook at the featurizer/model boundary.
  *
  * The reference maps provider failures to two user-facing classes —
  * `RESOURCE_EXHAUSTED` in the message → a quota error, anything else →
  * a generic failure (`/root/reference/services/geminiService.ts:11-17`)
  * — and its only rate control is a fixed inter-batch sleep
  * (`App.tsx:18,88-90`). Here the classification is typed and the
  * retry is exponential backoff applied around transient failures only;
  * quota errors surface immediately (retrying a quota error inside the
  * task would just burn executor time — at cluster scale you want the
  * task to fail fast and the job-level policy to decide).
  *
  * The in-process deterministic featurizer never throws, so this is the
  * seam a real remote embedder plugs into (`mapPartitions` batch call →
  * `Retry.withRetries(...)` around the RPC).
  */
sealed abstract class EmbedError(message: String, cause: Throwable)
  extends RuntimeException(message, cause)

/** Provider quota exhausted — not retryable at task level. */
final class QuotaExhausted(cause: Throwable)
  extends EmbedError("Embedding quota exhausted; reduce rate or raise quota", cause)

/** Anything else — retryable. */
final class TransientEmbedFailure(cause: Throwable)
  extends EmbedError(s"Transient embedding failure: ${cause.getMessage}", cause)

object Retry {

  /** The reference's message-sniffing classification
    * (`geminiService.ts:11-17`), typed. Already-typed errors pass
    * through unchanged (re-sniffing a QuotaExhausted's user-facing
    * message would demote it to transient). */
  def classify(e: Throwable): EmbedError = e match {
    case typed: EmbedError => typed
    case _ =>
      val msg = Option(e.getMessage).getOrElse("")
      if (msg.contains("RESOURCE_EXHAUSTED")) new QuotaExhausted(e)
      else new TransientEmbedFailure(e)
  }

  /** Run `f`, retrying transient failures with exponential backoff;
    * quota errors propagate immediately. Deterministic delays (no
    * jitter) keep retries reproducible in tests. */
  def withRetries[T](attempts: Int, baseDelayMs: Long)(f: => T): T = {
    require(attempts >= 1, s"attempts must be >= 1, got $attempts")
    var attempt = 0
    var lastError: EmbedError = null
    while (attempt < attempts) {
      try return f
      catch {
        // NonFatal only: OOM/InterruptedException (task kill) must
        // propagate immediately, not burn backoff sleeps
        case scala.util.control.NonFatal(e) =>
          classify(e) match {
            case q: QuotaExhausted => throw q
            case t: TransientEmbedFailure =>
              lastError = t
              attempt += 1
              if (attempt < attempts) Thread.sleep(baseDelayMs << (attempt - 1))
          }
      }
    }
    throw lastError
  }
}
