package graft.server

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Serving-plane overload shed — the analog of the reference's
  * query-route protection (internal/circuitbreaker/circuitbreaker.go
  * reject-fast Execute; the 503 + Retry-After envelope and the sampled
  * 1 Hz warn come from the catch-up gate, query.go:968-1005).
  *
  * Two independent reject-fast conditions, both O(1) per request:
  *  - in-flight query-route requests above `maxInFlight` — each query
  *    holds a Spark job group and a JSON/Arrow encode buffer, so
  *    unbounded admission converts a client stampede into driver OOM
  *    rather than queueing. The JDK server's accept pool would
  *    otherwise happily stack hundreds of exchanges.
  *  - heap headroom critical: used/max above `heapCriticalPct` AFTER
  *    the allocator has already grown the heap to its cap. A new query
  *    admitted at 97% heap mostly dies in encode anyway; shedding it
  *    early returns a clean, retryable signal instead of an
  *    OutOfMemoryError that can take unrelated in-flight queries down
  *    with it.
  *
  * Recovery is inherent (no open/half-open ladder needed): both
  * conditions are measured live, so draining in-flight work or a GC
  * that recovers headroom re-admits immediately — the property the
  * reference's half-open probe exists to approximate for remote
  * dependencies is FREE when the gated resource is in-process.
  */
final class OverloadGate(
    @volatile var maxInFlight: Int = 64,
    @volatile var heapCriticalPct: Int = 97) {

  private val inFlightCtr = new AtomicInteger(0)
  val shedTotal = new AtomicLong(0)
  /** Admissions since start — with [[shedTotal]] the pair gives the ops
    * metric AND a liveness oracle: a gate that keeps admitting under
    * saturation is healthy even when any single probe loses the slot
    * race to the standing load. */
  val admittedTotal = new AtomicLong(0)
  private val lastWarnNanos = new AtomicLong(0)

  def inFlight: Int = inFlightCtr.get()

  private def heapCritical: Boolean = {
    val rt = Runtime.getRuntime
    val max = rt.maxMemory()
    val total = rt.totalMemory()
    // only meaningful once the heap has grown to its cap — before that
    // the JVM can still expand instead of collecting
    total >= max - (max / 50) &&
      (total - rt.freeMemory()).toDouble / max > heapCriticalPct / 100.0
  }

  /** Admit or shed. On admit, the caller MUST `release()` in a finally.
    * Returns the shed reason when rejecting. */
  def tryAcquire(): Option[String] = {
    val n = inFlightCtr.incrementAndGet()
    if (maxInFlight > 0 && n > maxInFlight) {
      inFlightCtr.decrementAndGet()
      shedTotal.incrementAndGet()
      Some(s"server overloaded: $n in-flight queries (max $maxInFlight)")
    } else if (heapCritical) {
      inFlightCtr.decrementAndGet()
      shedTotal.incrementAndGet()
      Some(s"server overloaded: heap usage above $heapCriticalPct%")
    } else { admittedTotal.incrementAndGet(); None }
  }

  def release(): Unit = { inFlightCtr.decrementAndGet(); () }

  /** At most one warn per second under a sustained shed storm
    * (reference gate503LogIntervalNanos). */
  def shouldWarn(): Boolean = {
    val now = System.nanoTime()
    val last = lastWarnNanos.get()
    now - last >= 1000000000L && lastWarnNanos.compareAndSet(last, now)
  }
}
