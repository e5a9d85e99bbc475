package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the two properties that justify sorted-neighborhood dedup next
  * to the LSH / inverted-index families (q127 oracle-checks the exact
  * output): candidate volume is O(w·n) even under a fully degenerate
  * blocking key (the skew case that defeats frequency-capped inverted
  * indexes), and sort-adjacent planted dups are found while far-apart
  * ones are the documented recall trade.
  */
class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  test("degenerate key: candidates stay O(w*n), planted neighbors found") {
    val n = 200
    val w = 4
    // every doc shares the same first tokens (one giant sort block);
    // docs 2i and 2i+1 are near-identical pairs, adjacent by id
    val docs = (0 until n).map { i =>
      val pair = i / 2
      (i.toLong, s"common header tokens body$pair filler$pair tail${i % 2} " +
        s"extra$pair more$pair words$pair here$pair")
    }.toDF("doc_id", "text")
    val key = lit("same") // worst case: zero key discrimination
    val got = SortedNeighborhood.pairs(docs, "doc_id", "text", key, w, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted (2i, 2i+1) pair is adjacent in the id-tiebroken
    // order, hence inside any w >= 1 window
    val planted = (0 until n / 2).map(p => (2L * p, 2L * p + 1)).toSet
    assert(planted.subsetOf(got),
      s"missing planted pairs: ${(planted -- got).take(5)}")
    // candidate generation (pre-verify) is exactly the rank-window set:
    // sum over ranks of min(w, n-rank) < w*n — verify via the op's own
    // candidate bound rather than its filtered output
    assert(got.size < w * n)
  }

  test("multi-pass union over independent keys recovers cross-block recall") {
    // two dups whose lang keys differ sort far apart on key1 but
    // adjacent on key2 — the classic multi-pass remedy
    val docs = Seq(
      (0L, "aaa", "alpha beta gamma delta one two"),
      (1L, "zzz", "alpha beta gamma delta one two"),
      // spacers that keep 0 and 1 > w apart in key1 order
      (2L, "bbb", "unrelated content here totally different words"),
      (3L, "ccc", "another filler document with other tokens"),
      (4L, "ddd", "yet more padding text nothing shared at all"),
      (5L, "eee", "completely disjoint vocabulary again folks"),
      (6L, "fff", "still disjoint filler rows for the spacer block")
    ).toDF("doc_id", "lang", "text")
    val w = 2
    val byLang = SortedNeighborhood.pairs(docs, "doc_id", "text",
      col("lang"), w, 0.9).select("doc1", "doc2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!byLang.contains((0L, 1L)),
      "far-apart-on-key1 dup should be missed by a single pass (the trade)")
    val byText = SortedNeighborhood.pairs(docs, "doc_id", "text",
      substring(col("text"), 1, 10), w, 0.9).select("doc1", "doc2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byText.contains((0L, 1L)), s"text-key pass must find it: $byText")
    assert((byLang ++ byText).contains((0L, 1L)))
  }
}
