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

  test("incremental == full-corpus clean on the new batch; store grows by first-seen hashes") {
    import spark.implicits._
    // history (ids < 100) and a new batch (ids >= 100) with: a span
    // copied from history (cut via the store), a new span duplicated
    // WITHIN the batch (batch owner election), and unique text
    val history = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "x y z w v u")).toDF("doc_id", "text")
    val fresh = Seq(
      (100L, "p q alpha beta gamma r"),    // history span at pos 3
      (101L, "m n o new span here"),       // batch-owner of "new span here"
      (102L, "k l new span here m")        // batch copy at pos 3
    ).toDF("doc_id", "text")
    val full = SpanDedup.clean(history.union(fresh), "doc_id", "text", 3)
      .where(col("doc_id") >= 100L)
    val store = SpanDedup.hashStore(history, "doc_id", "text", 3)
    val (incr, firstSeen) = SpanDedup.cleanIncremental(
      fresh, "doc_id", "text", 3, store)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_removed"), r.getAs[String]("text_clean"))).toSet
    assert(rows(incr) == rows(full), s"incr=${rows(incr)} full=${rows(full)}")
    // the cross-batch copy was cut via the store, the in-batch copy via
    // batch owner election
    val byId = rows(incr).map(t => t._1 -> t).toMap
    assert(byId(100L)._4 == "p q r")
    assert(byId(101L)._4 == "m n o new span here")
    assert(byId(102L)._4 == "k l m")
    // first-seen hashes = the batch's distinct hashes minus the store
    val expectedNew = SpanDedup.hashStore(fresh, "doc_id", "text", 3)
      .except(store).collect().map(_.getLong(0)).toSet
    assert(firstSeen.collect().map(_.getLong(0)).toSet == expectedNew)

    // empty-store bootstrap: the first increment IS a full clean run
    val emptyStore = store.where(lit(false))
    val (boot, bootSeen) = SpanDedup.cleanIncremental(
      fresh, "doc_id", "text", 3, emptyStore)
    assert(rows(boot) == rows(SpanDedup.clean(fresh, "doc_id", "text", 3)))
    assert(bootSeen.count() ==
      SpanDedup.hashStore(fresh, "doc_id", "text", 3).count())
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
