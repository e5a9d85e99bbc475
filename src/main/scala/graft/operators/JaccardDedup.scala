package graft.operators

import graft.Materialize._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-set Jaccard near-dup with LOSSLESS prefix-filter candidate
  * generation (PPJoin family — Xiao et al., WWW'08) — the scale-safe
  * replacement for blocked all-pairs.
  *
  * The naive shape (q65's original plan, kept as [[pairsNaiveBlocked]]
  * for the parity spec) equi-joins docs on a block key and runs
  * within-block all-pairs `array_intersect`. Block width is unbounded:
  * on a realistic corpus, millions of same-language ~N-token documents
  * land in one block and the join emits quadratically (the sf1 step-up
  * measured 33.7× time at 10× data on the dense fixture). The prefix
  * filter bounds candidates by rare-token posting lists instead:
  *
  *  - rank each doc's distinct tokens rarest-first by global document
  *    frequency (ties by token — one total order for the whole corpus);
  *  - a pair with Jaccard ≥ t over sets of sizes n1, n2 must share
  *    ≥ ⌈t·max(n1,n2)⌉ ≥ ⌈t·n_own⌉ tokens, so EACH side must expose one
  *    of its first p = n − ⌊t·n⌋ + 1 rarest tokens to any qualifying
  *    partner: had the partner missed the whole prefix, at most
  *    n − p = ⌊t·n⌋ − 1 < ⌈t·n⌉ tokens remain to overlap. ⌊·⌋ (not ⌈·⌉)
  *    guards double rounding — a one-longer prefix is safe, a
  *    one-shorter prefix drops true pairs.
  *  - prefix-filtering principle: because BOTH prefixes are taken under
  *    the SAME total order, any qualifying pair's prefixes themselves
  *    intersect — so candidates come from a prefix × prefix equi-join,
  *    never prefix × all. An every-doc boilerplate token is by
  *    definition the most frequent, lands at the END of the rank order,
  *    and never enters a prefix at all — no cap needed, no accuracy
  *    loss.
  *
  * Candidates are verified exactly with the ORIGINAL string-set
  * intersection (`array_intersect`/`array_union` over the distinct
  * token arrays), so the output is bit-identical to the naive plan —
  * including the 6-dp rounded jaccard — by construction. The verify
  * join is bounded by the true near-dup candidate rate, not the corpus
  * size; AQE broadcasts it dynamically when small.
  *
  * Block columns (q65: lang, n_tokens) participate as candidate-join
  * keys, so cross-block pairs are pruned before the distinct, not
  * after verification.
  *
  * Reference analog: dedup has no native operator there (SURVEY §2.L2);
  * the oracle is the naive SQL join, unchanged.
  */
object JaccardDedup {

  /** Naive-join cardinality above which the prefix filter wins. The
    * block census gives Σ_block width² — the EXACT row count the
    * blocked join must verify. Measured on the synthetic documents
    * fixtures (local[32]): the naive join runs ≈4.5 µs/row of
    * array-intersect work (6.8 M rows → 31 s at sf1; 76 k rows →
    * 1.3 s at sf0.1), while the prefix path's fixed overhead — census,
    * rarest-first rank window, candidate distinct, verify join-back,
    * ~6 extra stages — costs ~3 s flat at these sizes. Cutover at 1e6
    * join rows ≈ the point where the naive join's per-row work exceeds
    * the prefix path's stage overhead; below it a mis-pick costs
    * seconds, above it the naive join grows quadratically in block
    * width while prefix candidates track rare-token postings. */
  private val NaiveJoinRowCutover = 1e6

  /** Census-driven dispatch between [[pairs]] (lossless prefix filter)
    * and the blocked all-pairs join — identical output either way
    * (JaccardDedupSpec pins parity on both regimes). The census is one
    * groupBy over the DOC-level frame (one row per block — cheap at any
    * corpus size) and computes the naive join's exact cardinality, so
    * the decision is data-driven the way ContainmentDedup.pairsAuto's
    * is: a 100 TB corpus with million-wide (lang, length) blocks goes to
    * the prefix filter; a small corpus skips its fixed stage cost. */
  def pairsAuto(docs: DataFrame, idCol: String, toksCol: String,
      blockCols: Seq[String], minJaccard: Double): DataFrame = {
    // materialize the prepped projection ONCE: the tokenize/distinct
    // exprs feeding toksCol are the dominant per-row cost at corpus
    // scale, and without this both the census and the chosen arm would
    // re-run them over the full input
    val slim = docs
      .select((col(idCol) +: blockCols.map(col) :+ col(toksCol)): _*)
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .materialize()
    val naiveRows = naiveJoinRows(slim, blockCols)
    if (naiveRows > NaiveJoinRowCutover)
      pairsImpl(slim, idCol, toksCol, blockCols, minJaccard,
        reshuffle = false) // slim is already repartitioned + checkpointed
    else pairsNaiveBlocked(slim, idCol, toksCol, blockCols, minJaccard)
  }

  /** Prefix-filtered Jaccard pairs. `docs` must carry `idCol`, the
    * block columns, and `toksCol` — an ALREADY-DISTINCT token array.
    * Output: (doc1, doc2, jaccard), doc1 < doc2, jaccard rounded to
    * 6 dp, only pairs with equal block-column values. */
  def pairs(docs: DataFrame, idCol: String, toksCol: String,
      blockCols: Seq[String], minJaccard: Double): DataFrame =
    pairsImpl(docs, idCol, toksCol, blockCols, minJaccard, reshuffle = true)

  /** `reshuffle = false` when the caller (pairsAuto) already spread the
    * prepped projection across the cluster — a second repartition of
    * the same width would be a full no-op shuffle of the corpus. */
  private def pairsImpl(docs: DataFrame, idCol: String, toksCol: String,
      blockCols: Seq[String], minJaccard: Double,
      reshuffle: Boolean): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in (0, 1], got $minJaccard")
    val parallelism = docs.sparkSession.sparkContext.defaultParallelism
    val sel = docs
      .select((col(idCol).as("doc") +: blockCols.map(col) :+
        col(toksCol).as("toks")): _*)
    val base = (if (reshuffle) sel.repartition(parallelism) else sel)
      .withColumn("n", size(col("toks")))
    val cands = candidatesFromBase(base, blockCols, minJaccard)
    // exact verification on the candidate list only — same formula as
    // the naive plan, so the output (and its 6-dp rounding) is
    // bit-identical
    val s1 = base.select(col("doc").as("d1"), col("toks").as("toks1"))
    val s2 = base.select(col("doc").as("d2"), col("toks").as("toks2"))
    cands.join(s1, Seq("d1")).join(s2, Seq("d2"))
      .withColumn("inter", size(array_intersect(col("toks1"), col("toks2"))))
      .withColumn("uni", size(array_union(col("toks1"), col("toks2"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") / col("uni"), 6))
      .where(col("jaccard") >= minJaccard)
      .select(col("d1").as("doc1"), col("d2").as("doc2"), col("jaccard"))
  }

  /** Prefix-filtered candidate (d1, d2) pairs only — the frame the
    * verify join runs on. Factored out of [[pairsImpl]] so the scale
    * probe (graft.ZipfProbe / SCALE.md "Zipf fixture" table) can count
    * candidates without paying the verify stage; `base` carries
    * doc / blockCols / toks / n. */
  private def candidatesFromBase(base: DataFrame, blockCols: Seq[String],
      minJaccard: Double): DataFrame = {
    val ex = base.select((col("doc") +: blockCols.map(col) :+ col("n") :+
      explode(col("toks")).as("tok")): _*)
    // global document-frequency census: the hot key is one aggregate
    // row per token, never a member list
    val dfc = ex.groupBy(col("tok")).agg(count(lit(1)).as("_df"))
    // rarest-first rank within each doc (window partitions are
    // doc-sized), keep only the prefix. Materialized once: it feeds
    // both sides of the candidate self-join.
    val byDoc = Window.partitionBy(col("doc"))
    val prefix = ex.join(dfc, Seq("tok"))
      .withColumn("pos",
        row_number().over(byDoc.orderBy(col("_df"), col("tok"))))
      .where(col("pos") <= col("n") - floor(col("n") * lit(minJaccard)) + 1)
      .drop("_df", "pos", "n")
      .materialize()
    val a = prefix.select((col("doc").as("d1") +: blockCols.map(col) :+
      col("tok")): _*)
    val b = prefix.select((col("doc").as("d2") +: blockCols.map(col) :+
      col("tok")): _*)
    a.join(b, "tok" +: blockCols)
      .where(col("d1") < col("d2"))
      .select(col("d1"), col("d2"))
      .distinct()
  }

  /** Probe-facing candidate count entry (same prep as [[pairs]]). */
  private[graft] def prefixCandidates(docs: DataFrame, idCol: String,
      toksCol: String, blockCols: Seq[String],
      minJaccard: Double): DataFrame = {
    val base = docs
      .select((col(idCol).as("doc") +: blockCols.map(col) :+
        col(toksCol).as("toks")): _*)
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .withColumn("n", size(col("toks")))
    candidatesFromBase(base, blockCols, minJaccard)
  }

  /** Naive-join cardinality Σ_block width² — the census [[pairsAuto]]
    * dispatches on, exposed for the scale probe. */
  private[graft] def naiveJoinRows(docs: DataFrame,
      blockCols: Seq[String]): Double =
    docs.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("c"))
      .agg(coalesce(sum(col("c") * col("c")), lit(0.0)))
      .head().getDouble(0)

  /** The census cutover, exposed for the probe's arm report. */
  private[graft] def cutover: Double = NaiveJoinRowCutover

  /** The blocked all-pairs shape — QUADRATIC in block width, so safe
    * ONLY below [[NaiveJoinRowCutover]] (where [[pairsAuto]] dispatches
    * to it) and as the parity oracle for JaccardDedupSpec. */
  private[graft] def pairsNaiveBlocked(docs: DataFrame, idCol: String,
      toksCol: String, blockCols: Seq[String],
      minJaccard: Double): DataFrame = {
    val a = docs.select((col(idCol).as("doc1") +: blockCols.map(col) :+
      col(toksCol).as("toks1")): _*)
    val b = docs.select((col(idCol).as("doc2") +: blockCols.map(col) :+
      col(toksCol).as("toks2")): _*)
    a.join(b, blockCols)
      .where(col("doc1") < col("doc2"))
      .withColumn("inter", size(array_intersect(col("toks1"), col("toks2"))))
      .withColumn("uni", size(array_union(col("toks1"), col("toks2"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") / col("uni"), 6))
      .where(col("jaccard") >= minJaccard)
      .select(col("doc1"), col("doc2"), col("jaccard"))
  }
}
