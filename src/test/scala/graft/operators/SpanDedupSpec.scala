package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact duplicated-span removal: planted cross-doc and within-doc
  * duplicate spans lose every occurrence but the first (doc, pos);
  * covered tokens are cut, short docs pass through, and untouched text
  * reassembles byte-identically.
  */
class SpanDedupSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      // owner of the cross-doc span "alpha beta gamma"
      (1L, "alpha beta gamma delta epsilon"),
      // same span at pos 3: tokens 3-5 cut
      (2L, "x y alpha beta gamma z"),
      // within-doc repeat of "p q r" (pos 1 owns, pos 5 cut)
      (3L, "p q r s p q r t"),
      // shorter than k: passes through
      (4L, "hi there"),
      // no duplicated spans at all
      (5L, "one two three four five six")
    ).toDF("doc_id", "text")
  }

  test("cross-doc and within-doc duplicate spans are cut; owners and short docs survive") {
    val out = SpanDedup.clean(docs, "doc_id", "text", 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[String]("text_clean")))).toMap
    assert(out(1L) == ((5L, 0L, "alpha beta gamma delta epsilon")))
    assert(out(2L) == ((6L, 3L, "x y z")))
    assert(out(3L) == ((8L, 3L, "p q r s t")))
    assert(out(4L) == ((2L, 0L, "hi there")))
    assert(out(5L) == ((6L, 0L, "one two three four five six")))
  }

  test("identical docs: the min-id doc keeps its text, the copy empties") {
    import spark.implicits._
    val twins = Seq(
      (10L, "a b c d e f"),
      (11L, "a b c d e f")).toDF("doc_id", "text")
    val out = SpanDedup.clean(twins, "doc_id", "text", 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("text_clean")))).toMap
    assert(out(10L) == ((0L, "a b c d e f")))
    assert(out(11L) == ((6L, "")))
  }
}
