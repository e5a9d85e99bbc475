package graft.server

import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the serving-plane shed gate (HTTP integration is in
  * HttpServerSpec's 503 case). */
class OverloadGateSpec extends AnyFunSuite {

  test("admits to the bound, sheds past it, re-admits after release") {
    val g = new OverloadGate(maxInFlight = 2, heapCriticalPct = 100)
    assert(g.tryAcquire().isEmpty)
    assert(g.tryAcquire().isEmpty)
    assert(g.inFlight == 2)
    val shed = g.tryAcquire()
    assert(shed.exists(_.contains("in-flight")))
    assert(g.inFlight == 2, "a shed request must not hold a slot")
    assert(g.shedTotal.get() == 1)
    g.release()
    assert(g.tryAcquire().isEmpty, "recovery is immediate after drain")
  }

  test("maxInFlight=0 disables the in-flight bound") {
    val g = new OverloadGate(maxInFlight = 0, heapCriticalPct = 100)
    (1 to 100).foreach(_ => assert(g.tryAcquire().isEmpty))
    assert(g.inFlight == 100)
  }

  test("concurrent acquire/release never exceeds the bound or leaks slots") {
    val g = new OverloadGate(maxInFlight = 8, heapCriticalPct = 100)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    // track ADMITTED concurrency with its own counter: g.inFlight may
    // transiently include a shedding thread's increment-before-check,
    // but the number of requests actually holding a slot is what the
    // bound guards
    val holding = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    val admitted = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = (1 to 400).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit =
          if (g.tryAcquire().isEmpty) {
            admitted.incrementAndGet()
            peak.accumulateAndGet(holding.incrementAndGet(), math.max)
            Thread.sleep(1)
            holding.decrementAndGet()
            g.release()
          }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    assert(peak.get() <= 8, s"bound violated: peak ${peak.get()}")
    assert(g.inFlight == 0, "all released")
    assert(admitted.get() + g.shedTotal.get() == 400)
  }

  test("sampled warn fires at most once per second") {
    val g = new OverloadGate()
    assert(g.shouldWarn())
    assert(!g.shouldWarn(), "second call inside the window must be suppressed")
  }
}
