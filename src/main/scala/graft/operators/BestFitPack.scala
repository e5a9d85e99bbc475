package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Doc-aligned training-sequence packing by best-fit decreasing — the
  * OTHER packing regime, complementing [[SequencePack]]'s pack-then-
  * split: documents never straddle sequence boundaries (no mid-document
  * attention breaks, no truncation mid-thought), at the cost of some
  * padding slack per bin. This is the regime argued for by the "fewer
  * truncations" line of work (Ding et al., ICML'24): pre-split only
  * documents LONGER than the context L into ceil(n/L) chunks, then
  * best-fit-decreasing bin-pack the chunks into L-token bins.
  *
  * Deterministic semantics (engine-exact, all int64):
  *  - chunks of doc w: c in [0, ceil(w/L)), size = min(L, w − c·L);
  *    zero-weight docs emit nothing;
  *  - per group, chunks are processed in (size DESC, key ASC, chunk ASC)
  *    order;
  *  - each chunk goes to the open bin with the SMALLEST remaining
  *    capacity ≥ size (ties → lowest bin id); if none fits, a new bin
  *    opens (ids count up from 0 in opening order);
  *  - `bin_off` = tokens already in the chosen bin at placement.
  *
  * Scale shape: the greedy is inherently sequential PER GROUP, so the
  * distribution unit is the group (and optionally `shards` hash-shards
  * within a group): chunking is a per-row explode, then ONE keyed
  * shuffle into `flatMapSortedGroups` — Spark's secondary sort delivers
  * each group's chunks in packing order without materializing the group,
  * and the kernel's state is the open-bin table only, O(tokens/L)
  * per shard, never the chunk stream. With `shards` = s, bin ids
  * interleave as local·s + shard (disjoint by construction) and the
  * extra slack is at most one partial bin per shard — the knob a 100 TB
  * corpus turns so no single task packs a whole source.
  */
object BestFitPack {

  /** Internal row shape (public: encoder codegen instantiates it). */
  case class Chunk(g: String, k: Long, c: Long, sz: Long, sh: Int)

  /** @return (group, key, chunk_id, n_toks, bin_id, bin_off) */
  def pack(df: DataFrame, groupCol: Column, keyCol: Column,
      weightCol: Column, seqLen: Long, shards: Int = 1): DataFrame = {
    require(seqLen > 0, s"sequence length must be positive, got $seqLen")
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    val chunks = df
      .select(groupCol.cast("string").as("g"),
        keyCol.cast("long").as("k"),
        coalesce(weightCol.cast("long"), lit(0L)).as("w"))
      .where(col("w") > 0L)
      .select(col("g"), col("k"), col("w"),
        explode(expr(s"sequence(0L, (w - 1) div ${seqLen}L)")).as("c"))
      .select(col("g"), col("k"), col("c"),
        least(lit(seqLen), col("w") - col("c") * seqLen).as("sz"),
        pmod(hash(col("k")), lit(shards)).cast("int").as("sh"))
      .as[Chunk]
    val packed = chunks
      .groupByKey(ch => (ch.g, ch.sh))
      .flatMapSortedGroups(col("sz").desc, col("k"), col("c")) {
        case ((g, sh), it) =>
          // open bins: remaining -> ids (best fit = ceiling lookup)
          val byRem = new java.util.TreeMap[Long, java.util.TreeSet[java.lang.Long]]()
          val remOf = scala.collection.mutable.LongMap.empty[Long]
          var nextBin = 0L
          def enlist(rem: Long, bin: Long): Unit = {
            val s = byRem.get(rem)
            if (s != null) { s.add(bin); () }
            else {
              val ns = new java.util.TreeSet[java.lang.Long]()
              ns.add(bin); byRem.put(rem, ns); ()
            }
          }
          it.map { ch =>
            val e = byRem.ceilingEntry(ch.sz)
            val bin =
              if (e == null) { // nothing fits: open the next bin
                val b = nextBin; nextBin += 1
                remOf(b) = seqLen
                b
              } else {
                val ids = e.getValue
                val b = ids.first().longValue()
                ids.remove(java.lang.Long.valueOf(b))
                if (ids.isEmpty) byRem.remove(e.getKey)
                b
              }
            val rem = remOf(bin)
            val off = seqLen - rem
            val nr = rem - ch.sz
            remOf(bin) = nr
            if (nr > 0) enlist(nr, bin) // slack 0 = bin closed
            // interleaved global id: disjoint across shards, dense
            // within a shard
            (g, ch.k, ch.c, ch.sz, bin * shards + sh, off)
          }
      }
      .toDF("group", "key", "chunk_id", "n_toks", "bin_id", "bin_off")
    packed
  }

  /** Per-group packing report: bins used, token totals, slack, and the
    * ceil(total/L) lower bound [[SequencePack]] achieves by splitting. */
  def report(packed: DataFrame, seqLen: Long): DataFrame =
    packed.groupBy(col("group"))
      .agg(countDistinct(col("bin_id")).as("bins_used"),
        count(lit(1)).as("n_chunks"),
        sum(col("n_toks")).as("total_tokens"))
      .select(col("group"), col("bins_used"), col("n_chunks"),
        col("total_tokens"),
        (col("bins_used") * seqLen - col("total_tokens")).as("slack_tokens"),
        call_function("div",
          col("total_tokens") + lit(seqLen - 1), lit(seqLen))
          .as("min_bins_if_split"))
}
