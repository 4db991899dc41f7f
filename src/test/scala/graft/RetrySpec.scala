package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.embed.{QuotaExhausted, Retry, TransientEmbedFailure}

/** Error taxonomy from geminiService.ts:11-17 + retry semantics. */
class RetrySpec extends AnyFunSuite {

  test("classify: RESOURCE_EXHAUSTED -> quota, else transient") {
    assert(Retry.classify(new RuntimeException("429 RESOURCE_EXHAUSTED: slow down"))
      .isInstanceOf[QuotaExhausted])
    assert(Retry.classify(new RuntimeException("connection reset"))
      .isInstanceOf[TransientEmbedFailure])
  }

  test("withRetries retries transient failures then succeeds") {
    var calls = 0
    val out = Retry.withRetries(attempts = 3, baseDelayMs = 1) {
      calls += 1
      if (calls < 3) throw new RuntimeException("flaky") else 42
    }
    assert(out == 42 && calls == 3)
  }

  test("withRetries gives up after attempts and throws typed error") {
    var calls = 0
    val e = intercept[TransientEmbedFailure] {
      Retry.withRetries(attempts = 2, baseDelayMs = 1) {
        calls += 1; throw new RuntimeException("always down")
      }
    }
    assert(calls == 2 && e.getMessage.contains("always down"))
  }

  test("quota errors are not retried") {
    var calls = 0
    intercept[QuotaExhausted] {
      Retry.withRetries(attempts = 5, baseDelayMs = 1) {
        calls += 1; throw new RuntimeException("RESOURCE_EXHAUSTED")
      }
    }
    assert(calls == 1)
  }
}
