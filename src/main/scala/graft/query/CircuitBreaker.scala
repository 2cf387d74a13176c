package graft.query

/** Threshold/cool-off circuit breaker around an agent backend (reference
  * lib/query/agent_circuit_breaker.ml:47-84; defaults config.ml:101-102).
  * Interface-parity stub: only needed when a live LLM reranker is wired.
  */
final class CircuitBreaker(threshold: Int = 5, cooloffMs: Long = 60000,
    now: () => Long = () => System.currentTimeMillis()) {

  private var failures = 0
  private var openedAt: Option[Long] = None

  def shouldAllow: Boolean = synchronized {
    openedAt match {
      case None => true
      case Some(t) => now() - t >= cooloffMs // half-open after cool-off
    }
  }

  def recordSuccess(): Unit = synchronized {
    failures = 0
    openedAt = None
  }

  def recordFailure(): Unit = synchronized {
    failures += 1
    if (failures >= threshold && openedAt.isEmpty) openedAt = Some(now())
    else if (openedAt.isDefined) openedAt = Some(now()) // re-open half-open
  }

  def state: String = synchronized {
    openedAt match {
      case None => "closed"
      case Some(t) if now() - t >= cooloffMs => "half_open"
      case _ => "open"
    }
  }
}
