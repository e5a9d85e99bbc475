package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paragraph-level boilerplate removal (the CCNet paragraph-dedup shape,
  * re-expressed for a corpus whose documents have no newlines): fixed
  * `segTokens`-token segments stand in for paragraphs; a segment
  * appearing in >= 2 DISTINCT documents is boilerplate and is dropped,
  * survivors reassemble in original order.
  *
  * Scale shape (100 TB): "appears in >= 2 distinct docs" is
  * min(id) != max(id) over ONE window on the segment key — COUNT
  * DISTINCT is not window-able but min/max are — so the exploded
  * segment stream shuffles once, then one per-doc rollup. Never
  * pairwise; output linear in corpus size. A distinct + count-distinct
  * + join-back does the same in 3 shuffles (q86's window-beats-join-back
  * lesson). Real corpora would window on a segment HASH to shrink
  * shuffle bytes; the string key keeps the DuckDB oracle exact.
  *
  * Used by q96_dedup_paragraphs and CorpusPipeline stage 0c.
  */
object SegmentDedup {

  /** Per-document segment-dedup annotations:
    * (idCol, carryCols..., n_segs, n_kept, text_clean). Documents whose
    * every segment is boilerplate come back with text_clean = "" (the
    * caller decides whether to drop them). `carryCols` must be constant
    * per document (they ride through the rollup as max()). Tokens are
    * bound to a column BEFORE the generator: slice inside the explode
    * lambda would re-tokenize per segment otherwise (no CSE through
    * generators).
    *
    * `skewSafe`: the default window shape needs every copy of a segment
    * in ONE task — a viral boilerplate segment (shared by millions of
    * docs at corpus scale) makes a hot partition key that AQE cannot
    * split a window over. skewSafe=true computes per-segment min/max
    * via groupBy (min/max are algebraic, so map-side partial
    * aggregation collapses the hot key BEFORE the shuffle) and
    * equi-joins the flags back. Real cost: the flag build and the join
    * probe are two consumers of the segs lineage, so the corpus is
    * tokenized and exploded TWICE (persisting the exploded stream at
    * 100 TB would cost more than the re-read — same call as q97's
    * bigram probe) — in exchange the skewed probe is a sort-merge join
    * AQE's skew-join CAN split, instead of one unsplittable hot window
    * task. Same output, proven by the parity property test. */
  def annotate(docs: DataFrame, idCol: String, textCol: String,
      segTokens: Int, carryCols: Seq[String] = Nil,
      skewSafe: Boolean = false): DataFrame = {
    val segs = docs
      .select((col(idCol) +: carryCols.map(col) :+
        TextFunctions.tokens(col(textCol)).as("_tk")): _*)
      .select((col(idCol) +: carryCols.map(col) :+ posexplode(
        transform(
          sequence(lit(0), floor((size(col("_tk")) - 1) / segTokens).cast("int")),
          i => array_join(slice(col("_tk"), i * segTokens + 1, lit(segTokens)), " "))
      )): _*)
      .withColumnRenamed("pos", "_i").withColumnRenamed("col", "_seg")
    val aggs = carryCols.map(c => max(col(c)).as(c)) ++ Seq(
      count(lit(1)).as("n_segs"),
      count(when(!col("_multi"), lit(1))).as("n_kept"),
      // collect_list skips nulls -> kept segments only; array_sort on
      // (_i, _seg) structs restores original order
      coalesce(array_join(transform(array_sort(collect_list(
        when(!col("_multi"), struct(col("_i"), col("_seg"))))),
        x => x.getField("_seg")), " "), lit("")).as("text_clean"))
    val flagged =
      if (!skewSafe) {
        val w = Window.partitionBy(col("_seg"))
        segs.withColumn("_multi",
          min(col(idCol)).over(w) =!= max(col(idCol)).over(w))
      } else {
        val bounds = segs.groupBy(col("_seg")).agg(
          (min(col(idCol)) =!= max(col(idCol))).as("_multi"))
        segs.join(bounds, "_seg")
      }
    flagged.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }
}
