package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011 — public literature): the
  * compressed-domain scan that makes billion-vector search affordable.
  *
  *  1. train: the vector space is split into `m` subspaces; each gets its
  *     own k-means codebook of `ksub` centroids (spark.ml, fixed seed).
  *  2. encode: every corpus vector becomes `m` small codes (one nearest
  *     sub-centroid each) — 100 TB of float embeddings compresses to
  *     ~m bytes/vector, usually 2 orders of magnitude smaller, and the
  *     search scan reads ONLY the code table.
  *  3. search (ADC): per query, a distance table (m × ksub: distance from
  *     the query's subvector to every sub-centroid) is computed
  *     driver-side — it is tiny — and broadcast; a candidate's
  *     approximate distance is the sum of m table lookups.
  *
  * Spark shape: encoding is m spark.ml transforms (one per subspace,
  * no shuffle); search explodes codes to (cand, sub, code) rows,
  * broadcast-joins the distance table, and partial-aggregates the sum —
  * rows for one candidate are adjacent post-explode, so the map-side
  * combine collapses them before the (query, cand) shuffle. Top-k is a
  * bounded per-query window. Composes with [[IvfIndex]] (IVF-PQ: probe
  * inverted lists, then ADC-scan only those lists' codes).
  */
object PqIndex {

  final case class Model(
      m: Int,
      subDim: Int,
      // codebooks(sub)(code) = sub-centroid vector
      codebooks: Array[Array[Array[Double]]],
      codes: DataFrame) // idCol, code_0 .. code_{m-1}

  /** Train per-subspace codebooks and encode the corpus. `dim` must be
    * divisible by `m`. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ksub: Int, seed: Long = 42L): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    import org.apache.spark.ml.functions.array_to_vector
    var df = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
    val subCols = (0 until m).map { s =>
      val c = s"_sub$s"
      df = df.withColumn(c, array_to_vector(slice(col("_v"), s * subDim + 1, subDim)))
      c
    }
    val codebooks = new Array[Array[Array[Double]]](m)
    (0 until m).foreach { s =>
      val km = new KMeans().setK(ksub).setSeed(seed + s)
        .setFeaturesCol(subCols(s)).setPredictionCol(s"code_$s")
      val model = km.fit(df)
      codebooks(s) = model.clusterCenters.map(_.toArray)
      df = model.transform(df)
    }
    val codes = graft.ModelCheckpoint.pin(
      df.select(col(idCol) +: (0 until m).map(s => col(s"code_$s")): _*))
    // pinned checkpoint: the code table IS the index; reused across
    // queries, survives harness sweeps
    Model(m, subDim, codebooks, codes)
  }

  /** ADC top-k: approximate squared-L2 via per-subspace table lookups.
    * `queries` must be a small batch (distance tables are computed
    * driver-side and broadcast). Deterministic: ties break on cand id. */
  def search(model: Model, queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    val spark = queries.sparkSession
    val qRows = queries.select(col(qIdCol), col(qVecCol).cast("array<double>")).collect()
    require(qRows.length <= 10000, "query batch too large for driver-side tables")

    // distance tables: (query_id, sub, code, d)
    import spark.implicits._
    val tables = qRows.toSeq.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1)
      for {
        s <- 0 until model.m
        (cent, code) <- model.codebooks(s).zipWithIndex
      } yield {
        var d = 0.0
        var j = 0
        while (j < model.subDim) {
          val diff = qv(s * model.subDim + j) - cent(j); d += diff * diff; j += 1
        }
        (qid, s, code, d)
      }
    }.toDF("query_id", "sub", "code", "d")

    val idCol = model.codes.columns.head
    val exploded = model.codes.select(col(idCol).as("cand_id"),
      posexplode(array((0 until model.m).map(s => col(s"code_$s")): _*))
        .as(Seq("sub", "code")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("cand_id"))
    exploded.join(broadcast(tables), Seq("sub", "code"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(round(sum(col("d")), 9).as("adc_dist"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("adc_dist"), col("rn"))
  }

  /** Two-stage search (the production shape — Jégou et al. §IV-A
    * "asymmetric distance with re-ranking"): ADC produces a shortlist of
    * `shortlist` candidates per query from the code table alone, then
    * ONLY those rows join back to the full-precision vectors for exact
    * L2 re-ranking. At 100 TB the wide vector column is read for
    * nQueries × shortlist rows instead of the whole corpus — the join
    * is an equi-join on the corpus id, and the shortlist side is tiny
    * (broadcast). Recall is set by `shortlist`, exactness of the final
    * ordering by the re-rank; on the random synthetic fixture pure ADC
    * recall@10 plateaus at ~0.42 (m=16) while shortlist=50 re-rank
    * clears 0.9 (AnnRecallSpec pins both).
    */
  def searchRerank(model: Model, corpus: DataFrame, corpusIdCol: String,
      corpusVecCol: String, queries: DataFrame, qIdCol: String,
      qVecCol: String, k: Int, shortlist: Int): DataFrame = {
    val spark = queries.sparkSession
    val qRows = queries.select(col(qIdCol), col(qVecCol).cast("array<double>")).collect()
    require(qRows.length <= 10000, "query batch too large for driver-side tables")
    import spark.implicits._
    val qv = qRows.toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toDF("query_id", "qv")
    val short = search(model, queries, qIdCol, qVecCol, k = shortlist)
      .select(col("query_id"), col("cand_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("l2_dist").asc, col("cand_id"))
    corpus
      .select(col(corpusIdCol).as("cand_id"),
        col(corpusVecCol).cast("array<double>").as("cv"))
      .join(broadcast(short.join(qv, "query_id")), "cand_id")
      .withColumn("l2_dist", round(aggregate(
        zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x), 9))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("l2_dist"), col("rn"))
  }
}
