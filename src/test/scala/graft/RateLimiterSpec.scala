package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.RateLimiter

/** P3 — token-bucket limiter parity with lib/api/rate_limiter.ml
  * (coverage mirrors test/test_rate_limiter.ml plus the retry-after
  * math and the both-or-nothing body-debit rule).
  */
class RateLimiterSpec extends AnyFunSuite {

  private def fakeClock(start: Double = 0.0): (() => Double, Double => Unit) = {
    var now = start
    (() => now, (d: Double) => { now += d })
  }

  test("allows request under budget; remaining non-negative") {
    val l = new RateLimiter(tokensPerMinute = 30, bucketSize = 5)
    l.check("192.168.0.1") match {
      case RateLimiter.Allowed(remaining) => assert(remaining >= 0.0)
      case _ => fail("expected request to be allowed")
    }
  }

  test("limits when tokens exhausted; metrics lines in reference format") {
    val l = new RateLimiter(tokensPerMinute = 60, bucketSize = 1)
    l.check("10.0.0.5")
    l.check("10.0.0.5") match {
      case RateLimiter.Limited(retryAfter, remaining) =>
        assert(retryAfter >= 0.0 && remaining >= 0.0)
      case _ => fail("expected limiter to trigger")
    }
    val m = l.metrics
    assert(m.contains("api_rate_limited_total 1"))
    assert(m.exists(line =>
      line.contains("ip=\"10.0.0.5\"") && line.endsWith(" 1")))
  }

  test("retry-after = deficit / refill rate; token refills with time") {
    val (now, advance) = fakeClock()
    // 60/min = 1 token/sec, bucket of 1: empty bucket refills in 1s
    val l = new RateLimiter(tokensPerMinute = 60, bucketSize = 1,
      timeSource = now)
    assert(l.check("1.2.3.4").isInstanceOf[RateLimiter.Allowed])
    l.check("1.2.3.4") match {
      case RateLimiter.Limited(retryAfter, _) =>
        assert(math.abs(retryAfter - 1.0) < 1e-9)
      case _ => fail("expected limited")
    }
    advance(1.0)
    assert(l.check("1.2.3.4").isInstanceOf[RateLimiter.Allowed])
  }

  test("prunes idle buckets on the prune interval") {
    val (now, advance) = fakeClock()
    val l = new RateLimiter(tokensPerMinute = 10, bucketSize = 1,
      idleTimeoutSec = 1.5, pruneIntervalSec = 0.5, timeSource = now)
    l.check("1.1.1.1"); l.check("2.2.2.2")
    assert(l.activeBucketCount == 2)
    advance(2.0)
    l.check("3.3.3.3")
    assert(l.activeBucketCount == 1)
    // a pruned client comes back with a fresh (full) bucket
    assert(l.check("1.1.1.1").isInstanceOf[RateLimiter.Allowed])
  }

  test("body quota enforced; body metric recorded") {
    val l = new RateLimiter(tokensPerMinute = 100, bucketSize = 100,
      bodyBytesPerMinute = Some(1000000L), bodyBucketSize = Some(1000000L))
    assert(l.check("8.8.8.8", Some(600000L))
      .isInstanceOf[RateLimiter.Allowed])
    l.check("8.8.8.8", Some(600000L)) match {
      case RateLimiter.Limited(retryAfter, _) => assert(retryAfter > 0.0)
      case _ => fail("expected body quota limiter to trigger")
    }
    assert(l.metrics.exists(_.startsWith("api_rate_limited_body_total 1")))
  }

  test("limited call debits nothing (both-or-nothing)") {
    val (now, advance) = fakeClock()
    val l = new RateLimiter(tokensPerMinute = 60, bucketSize = 2,
      bodyBytesPerMinute = Some(60L), bodyBucketSize = Some(10L),
      timeSource = now)
    // body bucket holds 10; a 20-byte body is limited but must not
    // consume the request token either
    l.check("a", Some(20L)) match {
      case RateLimiter.Limited(_, remaining) => assert(remaining == 2.0)
      case _ => fail("expected limited on body")
    }
    // a fitting body still has both full budgets available
    assert(l.check("a", Some(10L)).isInstanceOf[RateLimiter.Allowed])
    advance(0.0)
    // body bucket now empty; zero-byte body (cost 0) is still allowed
    assert(l.check("a", Some(0L)).isInstanceOf[RateLimiter.Allowed])
  }

  test("per-client isolation and address normalization") {
    val l = new RateLimiter(tokensPerMinute = 60, bucketSize = 1)
    assert(l.check("  Client-One  ").isInstanceOf[RateLimiter.Allowed])
    // same client after trim/lowercase/sanitize: "client_one"
    assert(l.check("client-one").isInstanceOf[RateLimiter.Limited])
    // different client unaffected
    assert(l.check("client-two").isInstanceOf[RateLimiter.Allowed])
    assert(l.normalizeKey("  Client-One  ") == "client_one")
    assert(l.normalizeKey("") == "unknown")
  }

  test("constructor validation mirrors the reference invalid_arg cases") {
    intercept[IllegalArgumentException](
      new RateLimiter(tokensPerMinute = 0, bucketSize = 1))
    intercept[IllegalArgumentException](
      new RateLimiter(tokensPerMinute = 1, bucketSize = 0))
    intercept[IllegalArgumentException](
      new RateLimiter(tokensPerMinute = 1, bucketSize = 1,
        bodyBucketSize = Some(5L))) // body burst requires body rate
  }
}
