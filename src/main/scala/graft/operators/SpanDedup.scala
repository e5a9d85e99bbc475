package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact duplicated-span REMOVAL — the substring-level dedup step of
  * Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
  * Better"): any k-token span occurring more than once in the corpus
  * keeps exactly ONE occurrence (the lexicographically first (doc, pos)
  * instance); every other occurrence's tokens are cut and the document
  * reassembles from the survivors. [[PassageCoverage]] measures this
  * duplication; this operator removes it.
  *
  * Semantics (deterministic, engine-exact):
  *  - spans are OVERLAPPING k-token windows at positions 1..n-k+1;
  *  - a position is removed iff its span hash has corpus frequency >= 2
  *    and the position is not the span's owner = min(doc, pos);
  *  - a token is cut iff ANY removed span covers it (the owner's copy
  *    can still lose tokens to a different overlapping duplicated span
  *    — the standard greedy approximation, applied identically in the
  *    oracle);
  *  - documents shorter than k tokens pass through untouched.
  *
  * Scale shape: the positioned span-hash stream shuffles once on the
  * hash (partial+final count is unnecessary — just the algebraic
  * min-owner, so map-side combine collapses hot hashes before the
  * wire), and the non-owner test needs NO join back on the hash: a
  * position holds exactly one span, so "this instance is not its
  * span's owner" is a LEFT ANTI join of the positioned stream against
  * the owner set, keyed on (doc, pos) — uniform by construction. A
  * viral boilerplate span never becomes a hot join key (the skew
  * problem PassageCoverage's skewSafe mode exists for does not arise
  * here at all). An f==1 span's only instance IS its owner, so the
  * f >= 2 condition is implied. Removals roll up per doc; the
  * reassembly is per-row HOF compute (no shuffle). Never pairwise in
  * documents; output linear in corpus size. The tokenizer runs twice
  * (span stream + reassembly) — at corpus scale re-reading beats
  * persisting an exploded stream larger than the corpus (same call as
  * PassageCoverage / q97).
  */
object SpanDedup {

  /** Per-document (idCol, n_tokens, n_removed, text_clean). */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    graft.GraftFunctions.registerAll(docs.sparkSession)
    val toks = TextFunctions.tokens(col(textCol))
    // positions are 1-based on both engines; Spark's sequence(1, 0)
    // DESCENDS instead of returning empty, so short docs need the guard
    val starts = when(size(toks) >= k, sequence(lit(1), size(toks) - (k - 1)))
      .otherwise(array().cast("array<int>"))
    val sh = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("_id"), posexplode(transform(starts,
        i => TextFunctions.tokenHash(concat_ws(" ", slice(toks, i, lit(k)))))))
      .select(col("_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("h"))
    // one owner row per distinct span hash (algebraic min — map-side
    // combine collapses hot hashes before the wire)
    val owners = sh.groupBy(col("h"))
      .agg(min(struct(col("_id").as("doc"), col("pos").as("p"))).as("o"))
      .select(col("o.doc").as("_id"), col("o.p").as("pos"))
    // non-owner instances: anti-join keyed on (doc, pos) — uniform by
    // construction, never on the (possibly viral) span hash
    val dup = sh.join(owners, Seq("_id", "pos"), "left_anti")
      .groupBy(col("_id"))
      .agg(sort_array(collect_list(col("pos"))).as("_dup_starts"))
    docs
      .join(dup, docs(idCol) === dup("_id"), "left")
      .withColumn("_ds", coalesce(col("_dup_starts"), array().cast("array<long>")))
      .withColumn("_kept", filter(
        transform(toks, (t, i) => struct(t.as("t"), (i + 1).as("i"))),
        x => !exists(col("_ds"),
          s => s <= x.getField("i") && x.getField("i") < s + k)))
      .select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        (size(toks) - size(col("_kept"))).cast("long").as("n_removed"),
        concat_ws(" ", transform(col("_kept"), x => x.getField("t")))
          .as("text_clean"))
  }
}
