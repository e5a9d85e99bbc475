package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Model-based property test for CoocLift: random corpora over a tiny
  * vocabulary (so pair collisions and the support floor are both
  * exercised) checked against a plain-Scala reference fold, across both
  * arms (hash dictionary and pairsAuto's census dispatch). The fixed
  * fixtures in CoocLiftSpec pin the known edges; this sweeps the space
  * the fixtures don't reach (docs made entirely of one repeated token
  * never occur — inputs here are DISTINCT token sets by construction,
  * matching the operator's contract). */
class CoocLiftPropsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(77L + i)))

  // distinct token subsets of a 8-word vocabulary, any size incl. empty
  private val vocab = Vector("a", "b", "c", "d", "ee", "ff", "g", "h")
  private val doc: Gen[Seq[String]] =
    Gen.someOf(vocab).map(_.toSeq.sorted)

  private def reference(docs: Seq[Seq[String]], minSupport: Int)
      : Map[(String, String), (Long, Long, Long)] = {
    val df = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    docs.flatMap { tk =>
      for (i <- tk.indices; j <- (i + 1) until tk.length) yield (tk(i), tk(j))
    }.groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 >= minSupport)
      .map { case ((a, b), cab) => (a, b) -> ((cab, df(a), df(b))) }
      .toMap
  }

  test("hash arm and census dispatch match the reference fold on random corpora") {
    for (trial <- 0 until 4) {
      val docs = sample(doc, 60 + trial * 17)
      val df = docs.zipWithIndex.map { case (tk, i) => (i.toLong, tk) }
        .toDF("doc_id", "tk")
      for (support <- Seq(1, 2, 4)) {
        val expect = reference(docs, support)
        def asMap(d: org.apache.spark.sql.DataFrame) =
          d.collect().map(r => (r.getString(0), r.getString(1)) ->
            ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
        assert(asMap(CoocLift.pairs(df, "doc_id", "tk", support)) === expect,
          s"hash arm trial=$trial support=$support")
        assert(asMap(CoocLift.pairsAuto(df, "doc_id", "tk", support)) === expect,
          s"pairsAuto trial=$trial support=$support")
      }
    }
  }
}
