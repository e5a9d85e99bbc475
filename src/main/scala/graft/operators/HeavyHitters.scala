package graft.operators

import graft.Materialize._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Exact frequency heavy hitters over an unbounded item stream, without
  * ever shuffling that stream by item.
  *
  * The naive spelling — `groupBy(item).count().where(cnt >= θ·N)` —
  * hash-partitions EVERY occurrence by item: at 100 TB of tokens that
  * is a full-corpus shuffle to find what is usually a few hundred
  * survivors. The classic two-pass shape bounds the moved data by the
  * candidate set instead:
  *
  *   1. CANDIDATES — one narrow scan runs a Misra–Gries summary with
  *      k counters per partition. MG's guarantee: an item whose count
  *      within partition p exceeds n_p/(k+1) is still in the counter
  *      map when the partition ends (each decrement event retires k+1
  *      occurrences, so an item with c occurrences is decremented at
  *      most n_p/(k+1) < c times). By averaging, any item with GLOBAL
  *      count > N/(k+1) beats that bound in at least one partition, so
  *      the union of per-partition candidate sets has NO false
  *      negatives for the threshold θ = minFreqPpm/1e6 as long as
  *      k+1 > 1/θ (we set k = floor(1/θ)+1). False positives are fine —
  *      pass 2 kills them.
  *   2. EXACT — the scan repeats, semi-joined (broadcast — the
  *      candidate set is ≤ k per partition) to the candidates; only
  *      candidate occurrences enter the count aggregation, and partial
  *      (map-side) aggregation collapses them to ≤ |candidates| rows
  *      per task BEFORE the exchange. The shuffle volume is
  *      O(partitions × candidates), independent of N.
  *
  * The result is EXACT (counts and membership), not an estimate: MG
  * only proposes, the recount disposes. Output is therefore
  * deterministic even though the intermediate candidate set depends on
  * partition layout and row order.
  *
  * Reference analog: none (the reference has no frequent-items path);
  * shape follows Misra & Gries 1982 / the MAD "frequent" summary.
  */
object HeavyHitters {

  /** Items with frequency ≥ minFreqPpm parts-per-million of the total
    * item count. Returns (item, cnt, n_total) — one row per hitter
    * plus the total for ratio rendering by the caller.
    *
    * @param items      frame holding one row per item occurrence
    * @param itemCol    item column (cast to string)
    * @param minFreqPpm frequency threshold in ppm, in (0, 1e6]
    */
  def exact(items: DataFrame, itemCol: String, minFreqPpm: Long): DataFrame = {
    require(minFreqPpm > 0 && minFreqPpm <= 1000000L,
      s"minFreqPpm must be in (0, 1e6], got $minFreqPpm")
    val spark = items.sparkSession
    import spark.implicits._
    val k = (1000000L / minFreqPpm).toInt + 1

    val toks = items.select(col(itemCol).cast("string").as("item"))

    // Pass 1: per-partition MG candidates + the partition's item count
    // (one sentinel-flagged row per partition — an explicit boolean
    // column, because null is a legal item value), in the same scan.
    val sketch = toks.as[String].mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      var n = 0L
      while (it.hasNext) {
        val x = it.next()
        n += 1
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1L)
          case None =>
            if (counters.size < k) counters.update(x, 1L)
            else {
              // decrement-all: O(k) here, amortized O(1)/item overall
              val dead = mutable.ArrayBuffer.empty[String]
              counters.foreach { case (key, c) =>
                if (c == 1L) dead += key else counters.update(key, c - 1L)
              }
              dead.foreach(counters.remove)
            }
        }
      }
      // an explicit sentinel FLAG, not a null item: null is a legal item
      // value (the naive groupBy this operator replaces reports it), so
      // using it as the count-row marker would silently drop a
      // null-heavy hitter from the result
      counters.keysIterator.map(t => (t, 0L, false)) ++
        Iterator((null: String, n, true))
    }.toDF("item", "local_n", "sentinel").materialize()

    val total = sketch.where(col("sentinel")).agg(sum("local_n").as("n_total"))
    val cands = sketch.where(!col("sentinel")).select("item").distinct()

    // Pass 2: exact recount restricted to candidates. The broadcast
    // semi join keeps the big side streaming; partial aggregation
    // bounds the exchange at |candidates| rows per task. Null-safe join
    // (<=>) so a null candidate matches its occurrences.
    toks.join(broadcast(cands.withColumnRenamed("item", "_cand")),
        col("item") <=> col("_cand"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where(col("cnt") * lit(1000000L) >= lit(minFreqPpm) * col("n_total"))
  }
}
