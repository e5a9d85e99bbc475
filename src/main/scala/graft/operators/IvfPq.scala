package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: the composed billion-scale ANN index (the composition the
  * FAISS lineage made standard — Jégou et al. TPAMI 2011 §V) — an IVF
  * coarse quantizer bounds WHICH vectors are scanned (nProbe/nLists of
  * the corpus), product-quantization codes bound WHAT is read per vector
  * (~m bytes instead of the float payload). At 100 TB: probing touches
  * ~1.6% of the corpus (nLists=4096, nProbe=64) and the scan reads the
  * code table only — both bounds multiply.
  *
  * Spark shape: the index is one DataFrame (id, list_id, code_0..m-1) —
  * persist partitioned by `list_id` in production so probing prunes data
  * FILES, not just rows. Search: (query, probed-list) rows broadcast
  * against the code table (equi-join on list_id), codes explode to
  * (sub, code) and join the broadcast per-query ADC distance tables,
  * partial-aggregated sums, bounded per-query top-k window.
  */
object IvfPq {

  final case class Model(
      ivf: IvfIndex.Model,
      pq: PqIndex.Model,
      index: DataFrame) // idCol, list_id, code_0 .. code_{m-1}

  def build(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, nLists: Int, m: Int, ksub: Int, seed: Long = 42L): Model = {
    val ivf = IvfIndex.build(corpus, idCol, vecCol, nLists, seed)
    val pq = PqIndex.build(corpus, idCol, vecCol, dim, m, ksub, seed)
    val index = graft.ModelCheckpoint.pin(pq.codes
      .join(ivf.assignments.select(col(idCol), col("list_id")), idCol))
    Model(ivf, pq, index)
  }

  /** Probe + ADC: approximate top-k within the probed inverted lists. */
  def search(model: Model, queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    val m = model.pq.m
    val subDim = model.pq.subDim
    val qRows = queries.select(col(qIdCol), col(qVecCol).cast("array<double>")).collect()
    require(qRows.length <= 10000, "query batch too large for driver-side probing")

    import spark.implicits._
    // (query_id, list_id) probe pairs — driver-side vs the tiny centroid set
    val probes = qRows.toSeq.flatMap { r =>
      val qv = r.getSeq[Double](1)
      model.ivf.centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < c.length) { val diff = c(j) - qv(j); d += diff * diff; j += 1 }
        (d, i)
      }.sortBy(_._1).take(nProbe).map { case (_, list) => (r.getLong(0), list) }
    }.toDF("query_id", "list_id")

    // per-query ADC distance tables (query_id, sub, code, d)
    val tables = qRows.toSeq.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1)
      for {
        s <- 0 until m
        (cent, code) <- model.pq.codebooks(s).zipWithIndex
      } yield {
        var d = 0.0
        var j = 0
        while (j < subDim) { val diff = qv(s * subDim + j) - cent(j); d += diff * diff; j += 1 }
        (qid, s, code, d)
      }
    }.toDF("query_id", "sub", "code", "d")

    val idCol = model.pq.codes.columns.head
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("cand_id"))
    model.index
      .join(broadcast(probes), "list_id") // only probed lists survive
      .select(col("query_id"), col(idCol).as("cand_id"),
        posexplode(array((0 until m).map(s => col(s"code_$s")): _*)).as(Seq("sub", "code")))
      .join(broadcast(tables), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(round(sum(col("d")), 9).as("adc_dist"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("adc_dist"), col("rn"))
  }

  /** Probe + ADC shortlist + exact re-rank (see [[PqIndex.searchRerank]]):
    * the IVF probe bounds WHICH vectors are ADC-scanned; the re-rank
    * reads full-precision vectors for only nQueries × shortlist rows —
    * the ivf assignment table (which carries the vectors) is probed by
    * an equi-join on the corpus id. Recall is bounded above by probe
    * coverage: a true neighbor in an unprobed list is unrecoverable, by
    * design. */
  def searchRerank(model: Model, queries: DataFrame, qIdCol: String,
      qVecCol: String, k: Int, nProbe: Int, shortlist: Int): DataFrame = {
    val spark = queries.sparkSession
    val qRows = queries.select(col(qIdCol), col(qVecCol).cast("array<double>")).collect()
    require(qRows.length <= 10000, "query batch too large for driver-side tables")
    import spark.implicits._
    val qv = qRows.toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toDF("query_id", "qv")
    val short = search(model, queries, qIdCol, qVecCol, k = shortlist,
        nProbe = nProbe)
      .select(col("query_id"), col("cand_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("l2_dist").asc, col("cand_id"))
    model.ivf.assignments
      .select(col(model.ivf.idCol).as("cand_id"),
        col(model.ivf.vecCol).cast("array<double>").as("cv"))
      .join(broadcast(short.join(qv, "query_id")), "cand_id")
      .withColumn("l2_dist", round(aggregate(
        zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x), 9))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("l2_dist"), col("rn"))
  }
}
