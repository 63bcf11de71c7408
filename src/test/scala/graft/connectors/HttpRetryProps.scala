package graft.connectors

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Laws of the retry backoff schedule — the pure math behind
  * [[HttpRetryPolicy.delayMs]], including the overflow clamps a hostile
  * Retry-After header or an absurd maxAttempts must not defeat.
  */
object HttpRetryProps extends Properties("HttpRetryPolicy") {

  private val policyGen: Gen[HttpRetryPolicy] = for {
    base <- Gen.chooseNum(0L, 100000L)
    extra <- Gen.chooseNum(0L, 1000000L)
  } yield HttpRetryPolicy(maxAttempts = 3, baseDelayMs = base,
    maxDelayMs = base + extra)

  property("delay is ALWAYS in [0, maxDelayMs] — any attempt count, any " +
      "Retry-After including hostile near-overflow values") =
    forAll(policyGen, Gen.chooseNum(1, 10000),
        Gen.option(Gen.oneOf(Gen.chooseNum(-10L, 10L),
          Gen.chooseNum(Long.MaxValue / 2000, Long.MaxValue)))) {
      (p, attempt, ra) =>
        val d = p.delayMs(attempt, ra)
        d >= 0 && d <= p.maxDelayMs
    }

  property("without Retry-After the backoff is monotone non-decreasing " +
      "in the attempt count until it saturates at maxDelayMs") =
    forAll(policyGen, Gen.chooseNum(1, 100)) { (p, attempt) =>
      p.delayMs(attempt + 1, None) >= p.delayMs(attempt, None)
    }

  property("a valid in-range Retry-After overrides the computed backoff " +
      "exactly; negative values are ignored") =
    forAll(policyGen, Gen.chooseNum(1, 30)) { (p, attempt) =>
      val inRange = p.maxDelayMs / 1000L / 2
      val expected = math.min(inRange * 1000L, p.maxDelayMs)
      p.delayMs(attempt, Some(inRange)) == expected &&
        p.delayMs(attempt, Some(-5L)) == p.delayMs(attempt, None)
    }

  property("retryOn: transport errors, 429 and 5xx are transient; other " +
      "4xx, 2xx and 3xx are never retried") =
    forAll(Gen.chooseNum(-1, 599)) { code =>
      val p = HttpRetryPolicy()
      val expect = code == -1 || code == 429 || (code >= 500 && code <= 599)
      p.retryOn(code) == expect
    }
}
