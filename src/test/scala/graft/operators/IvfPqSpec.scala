package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** IVF-PQ composition: probing must bound the scanned set, ADC ranking
  * within probed lists must keep cluster recall, and the whole search
  * stays deterministic.
  */
class IvfPqSpec extends SparkSpec {

  private val Dim = 16
  private val rnd = new Random(11)

  private def corpus() = {
    import spark.implicits._
    val centers = Array.tabulate(4, Dim)((c, j) => if (j % 4 == c) 10.0 else 0.0)
    val rows = (0 until 120).map { i =>
      val c = i % 4
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq
      (i.toLong + 100L, v, c)
    }
    rows.toDF("vec_id", "embedding", "cluster")
  }

  test("probe + ADC returns the query's cluster; scan bounded to probed lists") {
    import spark.implicits._
    val docs = corpus()
    val model = IvfPq.build(docs, "vec_id", "embedding", Dim,
      nLists = 4, m = 4, ksub = 8)
    val queries = (0 until 4).map { c =>
      (c.toLong, Array.tabulate(Dim)(j => if (j % 4 == c) 10.0f else 0.0f).toSeq)
    }.toDF("vec_id", "embedding")

    val got = IvfPq.search(model, queries, "vec_id", "embedding", k = 10, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val byCluster = docs.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    (0 until 4).foreach { c =>
      val hits = got(c.toLong).map(_._2)
      assert(hits.length == 10)
      assert(hits.forall(id => byCluster(id) == c),
        s"cluster $c leaked: ${hits.map(byCluster).mkString(",")}")
    }
    // nProbe=1 of nLists=4 with separated clusters: every candidate that
    // even reaches ADC comes from ONE inverted list (~30 of 120 vectors)
    val probedCands = IvfPq.search(model, queries.limit(1), "vec_id", "embedding",
      k = 1000, nProbe = 1).count()
    assert(probedCands <= 40, s"probe did not bound the scan: $probedCands")
  }

  test("search is deterministic") {
    import spark.implicits._
    val docs = corpus()
    val model = IvfPq.build(docs, "vec_id", "embedding", Dim,
      nLists = 4, m = 4, ksub = 8)
    val q = Seq((0L, Array.tabulate(Dim)(j => if (j % 4 == 0) 10.0f else 0.0f).toSeq))
      .toDF("vec_id", "embedding")
    val a = IvfPq.search(model, q, "vec_id", "embedding", 5, 2).collect().toSeq
    val b = IvfPq.search(model, q, "vec_id", "embedding", 5, 2).collect().toSeq
    assert(a == b)
  }
}
