package graft.core

/** Exponential backoff with jitter (reference lib/core/retry.ml:12-36).
  * Used by pluggable embedding / reranking backends around remote calls;
  * Spark task retries cover everything else.
  */
object Retry {
  final case class Policy(maxAttempts: Int = 3, initialDelayMs: Long = 200,
      multiplier: Double = 2.0, jitter: Double = 0.2)

  def withBackoff[A](policy: Policy = Policy(),
      isTransient: Throwable => Boolean = _ => true,
      sleep: Long => Unit = Thread.sleep)(f: => A): A = {
    var attempt = 0
    var delay = policy.initialDelayMs.toDouble
    while (true) {
      attempt += 1
      try return f
      catch {
        case t: Throwable if attempt < policy.maxAttempts && isTransient(t) =>
          // deterministic jitter from the attempt number (no global RNG:
          // keeps task retries reproducible)
          val j = 1.0 + policy.jitter * math.sin(attempt * 12.9898)
          sleep((delay * j).toLong)
          delay *= policy.multiplier
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
