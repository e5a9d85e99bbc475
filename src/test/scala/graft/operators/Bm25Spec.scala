package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("spark", "shuffle")

  // 0: dense in both terms; 1: one term; 2: none; 3: long doc diluting tf
  private def corpus = Seq(
    (0L, "spark shuffle spark shuffle spark plan"),
    (1L, "spark scan filter join order"),
    (2L, "scan filter join order merge sort"),
    (3L, "spark " + Seq.fill(60)("filler").mkString(" ")),
    (4L, "shuffle shuffle scan"),
    (5L, "merge sort batch row column value")
  ).toDF("doc_id", "text")

  test("production and rational scorers agree on ranking for a planted corpus") {
    val prod = Bm25.topK(corpus, "doc_id", "text", terms, 6)
      .select("doc_id").as[Long].collect()
    val rat = Bm25.topKRational(corpus, "doc_id", "text", terms, 6)
      .select("doc_id").as[Long].collect()
    assert(prod.head == 0L && rat.head == 0L, "densest doc must rank first")
    assert(prod.toSet == rat.toSet) // same matched set
  }

  test("duplicate query terms score identically to the distinct list") {
    // the r14 map-side tf transform emits one struct per array entry;
    // candidates() dedups the term list so a caller passing duplicates
    // cannot double a term's df/score (the public-API contract the old
    // explode+groupBy shape gave for free)
    val dup = Bm25.topK(corpus, "doc_id", "text",
      Seq("spark", "shuffle", "spark"), 6).collect().toSeq
    val dis = Bm25.topK(corpus, "doc_id", "text", terms, 6).collect().toSeq
    assert(dup == dis)
  }

  test("docs without any query term never appear; scores are positive") {
    val rows = Bm25.topKRational(corpus, "doc_id", "text", terms, 10)
      .select("doc_id", "score").as[(Long, Double)].collect()
    assert(!rows.map(_._1).contains(2L) && !rows.map(_._1).contains(5L))
    assert(rows.forall(_._2 > 0))
  }

  test("length normalization: same tf in a longer doc scores lower") {
    val rows = Bm25.topKRational(corpus, "doc_id", "text", Seq("spark"), 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(rows(1L) > rows(3L), s"short doc should beat diluted long doc: $rows")
  }

  test("k bounds the result") {
    assert(Bm25.topKRational(corpus, "doc_id", "text", terms, 2).count() == 2)
  }

  test("mulGuard passes in-range products and raises loudly on int64 wrap") {
    import graft.queries.mulGuard
    val df = Seq((3L, 4L), (Long.MaxValue / 2, 3L)).toDF("a", "b")
    val ok = df.where(col("a") === 3L)
      .select(mulGuard(col("a"), col("b"), "spec")).as[Long].collect()
    assert(ok.toSeq == Seq(12L))
    val e = intercept[Exception] {
      df.select(mulGuard(col("a"), col("b"), "spec")).collect()
    }
    assert(e.getMessage.contains("int64 overflow in spec"), e.getMessage)
  }
}
