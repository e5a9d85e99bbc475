package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Containment (subset-duplicate) detection: for candidate pairs,
  * C(A,B) = |S_A ∩ S_B| / min(|S_A|, |S_B|) over distinct shingle-hash
  * sets. Symmetric Jaccard misses the "doc B is doc A plus a header"
  * case (the union grows with the superset), which is exactly the shape
  * quote-heavy and templated web corpora produce; containment fires at
  * 1.0 whenever the smaller document's shingles are fully covered.
  *
  * 100 TB shape: the pair generator is the inverted-index self-join —
  * explode distinct shingles, equi-join on the shingle hash, count per
  * pair. Shuffles key on the shingle, group-by partials absorb repeat
  * pairs; nothing quadratic happens outside one shingle's posting list.
  * The known hot spot is a degenerate boilerplate shingle whose posting
  * list pairs quadratically in one task ([[maxDocFreq]]): capping drops
  * shingles present in more than that many documents from pair
  * generation — a shingle shared by half the corpus carries no
  * containment signal (it cannot distinguish pairs) but dominates the
  * join cost. The cap removes AT MOST `maxDocFreq` from any pair's
  * intersection count, so pairs at containment 1.0 on >maxDocFreq
  * distinct shingles survive; ContainmentDedupSpec pins both the
  * parity-when-cold and the capped-hot-key behavior.
  *
  * Reference has no analog; SURVEY §2.L59. The exact-SQL oracle (q113)
  * runs the same join uncapped.
  */
object ContainmentDedup {

  /** Candidate pairs with containment >= minContainment.
    * Output: (doc1, doc2, n_common, containment), doc1 < doc2.
    *
    * @param maxDocFreq 0 = exact (no cap); > 0 drops shingles whose
    *        document frequency exceeds the cap before pair generation.
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, minContainment: Double,
      maxDocFreq: Int = 0): DataFrame = {
    graft.GraftFunctions.registerAll(docs.sparkSession)
    val parallelism = docs.sparkSession.sparkContext.defaultParallelism
    val sets = docs.select(col(idCol), col(textCol))
      .repartition(parallelism)
      .select(col(idCol),
        MinHashDedup.shingleHashesFromTokens(col(textCol), shingleK).as("hs"))
      .select(col(idCol), size(col("hs")).as("n_sh"), explode(col("hs")).as("sh"))
    val posting =
      if (maxDocFreq <= 0) sets
      else {
        // doc-frequency census is one partial+final count per shingle —
        // the hot key is an aggregate row, never a member list
        val df = sets.groupBy(col("sh")).agg(count(lit(1)).as("_df"))
        sets.join(df.where(col("_df") <= maxDocFreq), Seq("sh")).drop("_df")
      }
    val a = posting.select(col(idCol).as("doc1"), col("n_sh").as("n1"), col("sh"))
    val b = posting.select(col(idCol).as("doc2"), col("n_sh").as("n2"), col("sh"))
    a.join(b, Seq("sh"))
      .where(col("doc1") < col("doc2"))
      .groupBy(col("doc1"), col("doc2"), col("n1"), col("n2"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("containment",
        graft.queries.round6(col("n_common"), least(col("n1"), col("n2"))))
      .where(col("containment") >= minContainment)
      .select(col("doc1"), col("doc2"), col("n_common"), col("containment"))
  }
}
