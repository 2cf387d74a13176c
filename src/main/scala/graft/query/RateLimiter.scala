package graft.query

import scala.collection.mutable

/** P3 — per-client token-bucket rate limiter for the serving surface.
  *
  * Reference: lib/api/rate_limiter.ml (token bucket per remote IP with
  * optional per-IP body-byte budget, idle pruning, Prometheus-style
  * metrics) wired as middleware in services/api/chessmate_api.ml:256-300
  * (429 + Retry-After on Limited). Semantics mirrored:
  *
  *   - one REQUEST token is consumed per allowed call; refill rate is
  *     `tokensPerMinute / 60` per second, capacity `bucketSize`, buckets
  *     start full (rate_limiter.ml ensure_bucket);
  *   - when a body budget is configured, the body debit must ALSO fit or
  *     the call is limited (both-or-nothing: an allowed call debits both,
  *     a limited call debits neither — rate_limiter.ml check);
  *   - retryAfter = max(request deficit, body deficit) / refill rate
  *     (rate_limiter.ml: Float.max r1 r2);
  *   - remote addresses are normalized (trim, lowercase, empty→"unknown")
  *     and sanitized to [alnum . : _] before keying;
  *   - idle buckets are pruned after `idleTimeoutSec`, with pruning work
  *     throttled to every `pruneIntervalSec` (driver memory stays bounded
  *     by active clients, not lifetime clients);
  *   - `metrics` renders the reference's exact line format
  *     (api_rate_limited_total / api_rate_limited_body_total, per-IP
  *     lines sorted, zero-count IPs omitted).
  *
  * Driver-side only (the serving path's admission control); never touches
  * Spark. `timeSource` is injectable for deterministic specs, as in the
  * reference (`?time_source`).
  */
final class RateLimiter(
    tokensPerMinute: Int,
    bucketSize: Int,
    bodyBytesPerMinute: Option[Long] = None,
    bodyBucketSize: Option[Long] = None,
    idleTimeoutSec: Double = 600.0,
    pruneIntervalSec: Double = 60.0,
    timeSource: () => Double = () => System.nanoTime() / 1e9) {

  require(tokensPerMinute > 0, "tokensPerMinute must be positive")
  require(bucketSize > 0, "bucketSize must be positive")
  require(idleTimeoutSec > 0, "idleTimeoutSec must be positive")
  require(pruneIntervalSec > 0, "pruneIntervalSec must be positive")
  require(bodyBytesPerMinute.forall(_ > 0),
    "bodyBytesPerMinute must be positive")
  require(bodyBucketSize.isEmpty || bodyBytesPerMinute.isDefined,
    "bodyBucketSize requires bodyBytesPerMinute")
  require(bodyBucketSize.forall(_ > 0), "bodyBucketSize must be positive")

  import RateLimiter.{Allowed, Decision, Limited}

  private val tokensPerSecond = tokensPerMinute / 60.0
  private val capacity = bucketSize.toDouble
  private val bodyPerSecond = bodyBytesPerMinute.map(_ / 60.0)
  private val bodyCapacity: Option[Double] =
    bodyBytesPerMinute.map(bpm =>
      bodyBucketSize.getOrElse(bpm).toDouble)

  private final class Bucket(now: Double) {
    var tokens: Double = capacity
    var bodyTokens: Double = bodyCapacity.getOrElse(0.0)
    var lastRefill: Double = now
    var lastSeen: Double = now
    var limitedCount: Int = 0
    var bodyLimitedCount: Int = 0
  }

  private val buckets = mutable.HashMap.empty[String, Bucket]
  private var totalLimited = 0
  private var totalBodyLimited = 0
  private var lastPrune = timeSource()

  /** trim, lowercase, empty→unknown, then [alnum . : _] only — the
    * reference's normalize_remote_addr + sanitize_identifier composed.
    */
  def normalizeKey(addr: String): String = {
    val cleaned = Option(addr).map(_.trim.toLowerCase).getOrElse("")
    val base = if (cleaned.isEmpty) "unknown" else cleaned
    base.map(c =>
      if (c.isLetterOrDigit || c == '.' || c == ':' || c == '_') c else '_')
  }

  private def refill(b: Bucket, now: Double): Unit = {
    val elapsed = now - b.lastRefill
    if (elapsed > 0) {
      b.tokens = math.min(capacity, b.tokens + elapsed * tokensPerSecond)
      (bodyPerSecond, bodyCapacity) match {
        case (Some(ps), Some(cap)) =>
          b.bodyTokens = math.min(cap, b.bodyTokens + elapsed * ps)
        case _ => ()
      }
      b.lastRefill = now
    }
  }

  private def pruneIfNeeded(now: Double): Unit =
    if (now - lastPrune >= pruneIntervalSec) {
      lastPrune = now
      val stale = buckets.collect {
        case (k, b) if now - b.lastSeen >= idleTimeoutSec => k
      }.toSeq
      stale.foreach(buckets.remove)
    }

  def check(remoteAddr: String, bodyBytes: Option[Long] = None): Decision =
    synchronized {
      val key = normalizeKey(remoteAddr)
      val now = timeSource()
      pruneIfNeeded(now)
      val b = buckets.getOrElseUpdate(key, new Bucket(now))
      refill(b, now)
      b.lastSeen = now
      // body cost participates only when a body budget is configured;
      // a configured budget with bytes<=0 costs 0 (still allowed path)
      val bodyCost: Option[Double] = (bodyBytes, bodyPerSecond) match {
        case (Some(n), Some(_)) if n > 0 => Some(n.toDouble)
        case (Some(_), Some(_)) => Some(0.0)
        case _ => None
      }
      val hasRequestToken = b.tokens >= 1.0
      val hasBodyTokens = bodyCost.forall(c => b.bodyTokens >= c)
      if (hasRequestToken && hasBodyTokens) {
        b.tokens -= 1.0
        bodyCost.foreach(c =>
          if (c > 0) b.bodyTokens = math.max(0.0, b.bodyTokens - c))
        Allowed(b.tokens)
      } else {
        val requestRetry: Option[Double] =
          if (hasRequestToken) None
          else Some((1.0 - b.tokens) / tokensPerSecond)
        val bodyRetry: Option[Double] = (bodyCost, bodyPerSecond) match {
          case (Some(c), Some(ps)) if b.bodyTokens < c =>
            Some((c - b.bodyTokens) / ps)
          case _ => None
        }
        b.limitedCount += 1
        totalLimited += 1
        if (bodyRetry.isDefined) {
          b.bodyLimitedCount += 1
          totalBodyLimited += 1
        }
        val retryAfter = (requestRetry, bodyRetry) match {
          case (None, None) => 0.0
          case (Some(r), None) => r
          case (None, Some(r)) => r
          case (Some(r1), Some(r2)) => math.max(r1, r2)
        }
        Limited(retryAfter, b.tokens)
      }
    }

  /** Prometheus-style lines, reference format exactly:
    * total first, then per-IP request lines sorted, then (if a body
    * budget exists) body total + per-IP body lines sorted.
    */
  def metrics: Seq[String] = synchronized {
    pruneIfNeeded(timeSource())
    val perIp = buckets.toSeq.collect {
      case (k, b) if b.limitedCount > 0 =>
        s"""api_rate_limited_total{ip="$k"} ${b.limitedCount}"""
    }.sorted
    val bodyLines =
      if (bodyPerSecond.isEmpty) Seq.empty[String]
      else {
        val perIpBody = buckets.toSeq.collect {
          case (k, b) if b.bodyLimitedCount > 0 =>
            s"""api_rate_limited_body_total{ip="$k"} ${b.bodyLimitedCount}"""
        }.sorted
        s"api_rate_limited_body_total $totalBodyLimited" +: perIpBody
      }
    (s"api_rate_limited_total $totalLimited" +: perIp) ++ bodyLines
  }

  def activeBucketCount: Int = synchronized {
    pruneIfNeeded(timeSource())
    buckets.size
  }
}

object RateLimiter {
  sealed trait Decision
  final case class Allowed(remaining: Double) extends Decision
  final case class Limited(retryAfter: Double, remaining: Double)
      extends Decision
}
