package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023,
  * arXiv:2303.09540): k-means cluster the embedding space, then inside
  * each cluster drop every item whose cosine similarity to a
  * LOWER-id cluster member reaches the threshold — one deterministic
  * survivor (the minimum id) per within-cluster duplicate group chain.
  *
  * Scale shape: the coarse clustering is the SAME k-means pass as the
  * IVF index (reused via [[IvfIndex.build]]), and the pairwise stage is
  * an equi-join on `cluster_id` — quadratic cost confined to one
  * cluster, never across the corpus. With nClusters ~ sqrt(N) the
  * expected per-cluster work is O(N) total; a hot cluster is the same
  * failure mode as an LSH hot bucket (cap or re-split it). Cross-cluster
  * near-duplicates are NOT examined — that is SemDeDup's documented
  * approximation, not a bug; raise nProbe-style recall by lowering
  * nClusters or pre-merging with the LSH banded path (q69).
  */
object SemanticDedup {

  /** Per-item verdict: (idCol, cluster_id, dup_of, is_kept).
    * `dup_of` = the smallest lower id in the same cluster within
    * `threshold` cosine (null ⇒ kept); `is_kept` = 1 - "has any such
    * neighbor". Greedy-by-id contract: an item is dropped if ANY
    * lower-id member is close enough, whether or not that member was
    * itself dropped — deterministic on any cluster layout and
    * independent of execution order.
    */
  def verdicts(corpus: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, threshold: Double, seed: Long = 42L): DataFrame = {
    val model = IvfIndex.build(corpus, idCol, vecCol, nClusters, seed)
    verdictsFromAssignments(model.assignments, idCol, vecCol, threshold)
  }

  /** Same contract over a precomputed (id, vec, list_id) assignment —
    * lets callers reuse an existing IVF index for dedup. */
  def verdictsFromAssignments(assignments: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    val a = assignments.select(col("list_id"),
      col(idCol).as("_id_a"), col(vecCol).as("_va"))
    val b = assignments.select(col("list_id"),
      col(idCol).as("_id_b"), col(vecCol).as("_vb"))
    val dups = a.join(b, "list_id")
      .where(col("_id_b") < col("_id_a"))
      .where(VectorFunctions.cosine(col("_va"), col("_vb")) >= threshold)
      .groupBy(col("_id_a")).agg(min(col("_id_b")).as("dup_of"))
    assignments
      .join(dups, assignments(idCol) === dups("_id_a"), "left")
      .select(assignments(idCol), col("list_id").as("cluster_id"),
        col("dup_of"),
        when(col("dup_of").isNull, lit(1)).otherwise(lit(0)).as("is_kept"))
  }
}
