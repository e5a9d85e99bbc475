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

  test("property: matches a brute-force reference on random small-alphabet corpora") {
    import spark.implicits._
    // small alphabet + short docs force heavy span collisions (the
    // interesting regime: overlapping removals, within-doc repeats,
    // cross-doc owner races decided by (doc, pos))
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c", "d")
    for (trial <- 0 until 3) {
      val k = 2 + trial % 2 // k = 2, 3, 2
      val corpus = (0 until 30).map { i =>
        val n = 1 + rnd.nextInt(12)
        (i.toLong, Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
      }
      // reference: literal spec semantics, no hashing
      val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
      val instances = toks.toSeq.flatMap { case (id, tk) =>
        (0 to tk.length - k).map(p => (tk.slice(p, p + k).mkString(" "), id, p + 1))
      }
      val owner = instances.groupBy(_._1).map { case (s, inst) =>
        s -> inst.map(t => (t._2, t._3)).min
      }
      val expected = corpus.map { case (id, _) =>
        val tk = toks(id)
        val dupStarts = (0 to tk.length - k).map(_ + 1).filter { p =>
          owner(tk.slice(p - 1, p - 1 + k).mkString(" ")) != ((id, p))
        }
        val kept = tk.zipWithIndex.filterNot { case (_, i0) =>
          dupStarts.exists(s => s <= i0 + 1 && i0 + 1 < s + k)
        }.map(_._1)
        id -> ((tk.length.toLong, (tk.length - kept.length).toLong,
          kept.mkString(" ")))
      }.toMap
      val got = SpanDedup.clean(corpus.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
            r.getAs[String]("text_clean")))).toMap
      assert(got == expected, s"trial $trial (k=$k) diverged")
    }
  }
}
