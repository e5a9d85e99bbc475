package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Product-quantization ANN: ADC ranking must (a) recover a noiseless
  * cluster member exactly, (b) reach high recall vs exact L2 top-k on
  * clustered data — the regime PQ is designed for — and (c) be
  * deterministic across runs (fixed seeds, tie-break on cand id).
  */
class PqIndexSpec extends SparkSpec {

  private val Dim = 16
  private val rnd = new Random(7)

  /** 4 well-separated cluster centers; members = center + tiny noise. */
  private def corpus() = {
    import spark.implicits._
    val centers = Array.tabulate(4, Dim)((c, j) => if (j % 4 == c) 10.0 else 0.0)
    val rows = (0 until 80).map { i =>
      val c = i % 4
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq
      (i.toLong + 100L, v, c)
    }
    rows.toDF("vec_id", "embedding", "cluster")
  }

  test("ADC top-k finds the query's own cluster with full recall") {
    import spark.implicits._
    val docs = corpus()
    val model = PqIndex.build(docs, "vec_id", "embedding", Dim, m = 4, ksub = 8)
    // queries: one exact cluster center per cluster
    val queries = (0 until 4).map { c =>
      (c.toLong, Array.tabulate(Dim)(j => if (j % 4 == c) 10.0f else 0.0f).toSeq)
    }.toDF("vec_id", "embedding")
    val got = PqIndex.search(model, queries, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val byCluster = docs.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    (0 until 4).foreach { c =>
      val hits = got(c.toLong).map(_._2)
      assert(hits.length == 10)
      // every returned neighbor belongs to the query's cluster
      assert(hits.forall(id => byCluster(id) == c),
        s"cluster $c: got ${hits.map(byCluster).mkString(",")}")
    }
  }

  test("search is deterministic across invocations") {
    import spark.implicits._
    val docs = corpus()
    val model = PqIndex.build(docs, "vec_id", "embedding", Dim, m = 4, ksub = 8)
    val queries = Seq((0L, Array.tabulate(Dim)(j => if (j % 4 == 0) 10.0f else 0.0f).toSeq))
      .toDF("vec_id", "embedding")
    val a = PqIndex.search(model, queries, "vec_id", "embedding", k = 5).collect().toSeq
    val b = PqIndex.search(model, queries, "vec_id", "embedding", k = 5).collect().toSeq
    assert(a == b)
  }

  test("code table compresses to m small codes per vector") {
    val docs = corpus()
    val model = PqIndex.build(docs, "vec_id", "embedding", Dim, m = 4, ksub = 8)
    assert(model.codes.columns.toSeq == Seq("vec_id", "code_0", "code_1", "code_2", "code_3"))
    val mx = model.codes.agg(max(greatest(
      col("code_0"), col("code_1"), col("code_2"), col("code_3")))).head().getInt(0)
    assert(mx < 8) // codes fit the ksub codebook (byte-sized at ksub<=256)
  }
}
