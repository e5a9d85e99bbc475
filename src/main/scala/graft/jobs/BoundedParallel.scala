package graft.jobs

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Bounded driver-side parallelism for INDEPENDENT per-partition /
  * per-measurement Spark jobs (VERDICT r3 #4): a maintenance tick over a
  * large backlog used to serialize hundreds of small jobs through the
  * driver loop, paying one job-scheduling latency each. Submitting them
  * from a bounded pool lets the scheduler overlap them (local or FAIR
  * cluster mode alike) while capping concurrent driver/FS pressure. The
  * unit of work stays one partition — crash-safety properties (manifest
  * journaling, tmp-dir swaps) are per-partition and unaffected by
  * concurrent submission to DIFFERENT partitions.
  */
object BoundedParallel {

  /** Map `f` over `items` on at most `parallelism` threads; results in
    * input order. The first failure propagates (remaining work may still
    * run to completion — each item is independent by contract). */
  def run[A, B](items: Seq[A], parallelism: Int = 8)(f: A => B): Seq[B] = {
    val n = math.max(1, math.min(parallelism, items.size))
    if (n <= 1) items.map(f)
    else {
      val pool = Executors.newFixedThreadPool(n)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val futures = items.map(a => Future(f(a)))
        futures.map(Await.result(_, Duration.Inf))
      } finally pool.shutdown()
    }
  }
}
