package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sorted-neighborhood dedup (Hernández & Stolfo, "The Merge/Purge
  * Problem for Large Databases", SIGMOD 1995) — the third classic
  * blocking family next to LSH banding (MinHashDedup) and inverted-index
  * joins (ContainmentDedup): sort the corpus by a cheap discriminating
  * key, slide a window of `w` records over the global order, and verify
  * only the ≤ w·n in-window pairs.
  *
  * Where it earns its keep at 100 TB: candidate generation is O(w·n)
  * REGARDLESS of key-collision skew — a boilerplate key that floods an
  * LSH bucket or an inverted-index posting list produces exactly w
  * neighbors per record here, so SNM is the bounded-cost fallback for
  * corpora whose hot keys defeat frequency caps. The trade is recall:
  * only near-dups whose keys sort adjacently are found (the classic
  * multi-pass answer: union pairs over several independent keys).
  *
  * Scale shape: the global order comes from [[GlobalRank.withRowNumber]]
  * (range exchange + partition-local sort + columnar offset stamp —
  * never a single-task window). Neighbor pairing explodes each rank
  * into its next-w rank ids (ids only, w small longs per row) and
  * equi-joins rank→rank; token sets attach afterwards by two hash joins
  * so the corpus token arrays are shuffled once each, not w times.
  */
object SortedNeighborhood {

  /** Candidate near-dup pairs with exact token-set Jaccard ≥
    * `minJaccard`, windows of `w` neighbors in `keyCol` order.
    * Output: (doc1, doc2, jaccard), doc1 < doc2 by id. */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      keyCol: Column, w: Int, minJaccard: Double): DataFrame = {
    require(w > 0, s"window must be positive: $w")
    val keyed = docs
      .select(col(idCol).as("doc"), keyCol.as("_key"),
        array_distinct(TextFunctions.tokens(col(textCol))).as("tk"))
    val ranked = GlobalRank.withRowNumber(
      keyed, Seq(col("_key"), col("doc")), "rn")
    val ids = ranked.select(col("doc"), col("rn"))
    // ids-only pairing: each rank meets its next w ranks exactly once
    val cand = ids
      .select(col("doc").as("d1"),
        explode(sequence(col("rn") + 1, col("rn") + w)).as("rn2"))
      .join(ids.toDF("d2", "rn2"), "rn2")
      .select(col("d1"), col("d2"))
    val sets = ranked.select(col("doc"), col("tk"))
    cand.join(sets.toDF("d1", "tk1"), "d1")
      .join(sets.toDF("d2", "tk2"), "d2")
      .withColumn("jaccard", graft.queries.round6(
        size(array_intersect(col("tk1"), col("tk2"))),
        size(array_union(col("tk1"), col("tk2")))))
      .where(col("jaccard") >= minJaccard)
      .select(least(col("d1"), col("d2")).as("doc1"),
        greatest(col("d1"), col("d2")).as("doc2"), col("jaccard"))
  }
}
