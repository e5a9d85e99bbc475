package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection with signature-band blocking.
  *
  * The 32-bit signature is split into [[numBands]] contiguous bit bands.
  * By pigeonhole, any pair within Hamming distance `numBands - 1` shares
  * at least one identical band, so a band equi-join finds EVERY such pair
  * — unlike attribute blocking (e.g. on token counts), which silently
  * drops near-dups that differ in the blocked attribute. With the default
  * 7 bands the hd ≤ 6 result is exactly the brute-force result, at
  * band-bucket join cost instead of O(n²).
  *
  * Scale shape (same as [[MinHashDedup]]): signatures computed once
  * (native SimHashBits expression), explode to (band, key) rows, shuffle
  * on the band key into small buckets, pairwise only within buckets,
  * exact Hamming verification, distinct. No cartesian anywhere.
  *
  * Threshold guidance at corpus scale (measured, SCALE.md round-12
  * "Zipf-vocabulary dedup scale study"): UNWEIGHTED token features
  * saturate on open-vocabulary corpora — every document's bit-majority
  * vote is dominated by the same few hundred Zipf-head words, so
  * signatures cluster and hd ≤ 2 over 32 bits flags ~40% of ALL pairs
  * (2.0e9 pairs at 100k docs; the join stays output-bound, the ANSWER
  * is what degenerates). For such corpora weight each token's ±1 vote
  * by idf (rare tokens drive bits) or widen the signature; the
  * closed-vocabulary oracle fixture keeps the unweighted 32-bit form
  * meaningful because it has no frequency tail.
  */
object SimHashDedup {

  val DefaultMaxHammingDistance = 6

  /** Bit widths of the bands covering `bits` signature bits:
    * `maxHd + 1` bands as equal as possible (32 bits / 7 → 5,5,5,5,4,4,4). */
  private[operators] def bandWidths(bits: Int, numBands: Int): Seq[Int] = {
    val base = bits / numBands
    val extra = bits % numBands
    Seq.fill(extra)(base + 1) ++ Seq.fill(numBands - extra)(base)
  }

  private[operators] def bandWidths(numBands: Int): Seq[Int] =
    bandWidths(TextFunctions.SimHashBits, numBands)

  /** (band index, band key) struct array for a signature column. */
  private def bandKeys(sh: Column, bits: Int, numBands: Int): Column = {
    val widths = bandWidths(bits, numBands)
    array(widths.zipWithIndex.map { case (w, i) =>
      struct(lit(i).as("b"), bandKey(sh, bits, numBands, i).as("k"))
    }: _*)
  }

  /** Band `i` of a signature, as a Long key. A full-width 64-bit band
    * would shift a negative mask; widths below 64 by construction when
    * numBands >= 2 (maxHd >= 1). */
  private def bandKey(sh: Column, bits: Int, numBands: Int, i: Int): Column = {
    val widths = bandWidths(bits, numBands)
    val offsets = widths.scanLeft(0)(_ + _)
    shiftrightunsigned(sh, offsets(i)).bitwiseAND(lit((1L << widths(i)) - 1))
  }

  /** Candidate pairs (doc1 < doc2, hd) with hd ≤ maxHd — exact: banding
    * with maxHd+1 bands guarantees no pair within maxHd is missed. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
      maxHd: Int = DefaultMaxHammingDistance): DataFrame = {
    val spark = docs.sparkSession
    val sigs = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc_id"),
        TextFunctions.simhash(col(textCol)).as("sh"))
      .localCheckpoint() // signatures are CPU-heavy: compute exactly once
    pairsFromSignatures(sigs, TextFunctions.SimHashBits, maxHd)
  }

  /** The banding/verify kernel over an ARBITRARY signature frame
    * (`doc_id`, `sh`) of `bits`-wide hashes — shared by text SimHash
    * (q67) and image perceptual hashes ([[Multimodal.nearDupImagePairs]]).
    * Pigeonhole-exact for Hamming distance ≤ maxHd. */
  def pairsFromSignatures(sigs: DataFrame, bits: Int,
      maxHd: Int = DefaultMaxHammingDistance): DataFrame = {
    // maxHd=0 with 64-bit signatures makes ONE full-width band whose
    // mask (1L << 64) - 1 wraps to 0 — every band key collapses to 0 and
    // the self-join goes quadratic (r8 advice). Exact-duplicate search
    // at maxHd=0 is a plain groupBy on sh; this kernel requires banding.
    require(maxHd >= 1 || bits < 64,
      s"maxHd=0 with bits=$bits needs no banding — groupBy the signature " +
        "directly (a full-width 64-bit band mask wraps to 0)")
    val numBands = maxHd + 1
    val bands = sigs.select(col("doc_id"), col("sh"),
      explode(bandKeys(col("sh"), bits, numBands)).as("band"))
    val a = bands.select(col("doc_id").as("doc1"), col("sh").as("sh1"), col("band"))
    val b = bands.select(col("doc_id").as("doc2"), col("sh").as("sh2"), col("band"))
    // first-matching-band emission replaces a distinct() over the full
    // candidate set: a pair matching in k bands appears in k buckets, but
    // only the bucket of its SMALLEST matching band emits it (cheap bit
    // compares on the carried signatures) — no dedup shuffle, each pair
    // exactly once. At sf0.1 q67 produces 589k pairs; distinct() shuffled
    // all of them, this filter drops duplicates map-side.
    val firstBand = (0 until numBands).map { j =>
      (col("band.b") > j) &&
        (bandKey(col("sh1"), bits, numBands, j) ===
          bandKey(col("sh2"), bits, numBands, j))
    }.reduce(_ || _)
    a.join(b, "band")
      .where(col("doc1") < col("doc2"))
      .where(!firstBand)
      .withColumn("hd", bit_count(col("sh1").bitwiseXOR(col("sh2"))))
      .where(col("hd") <= maxHd)
      .select(col("doc1"), col("doc2"), col("hd"))
  }
}
