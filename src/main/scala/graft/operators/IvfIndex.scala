package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor index — the
  * scale path for embedding similarity search:
  *
  *  1. build: k-means coarse quantizer (spark.ml KMeans, fixed seed)
  *     assigns every corpus vector to one of `nLists` inverted lists;
  *     the assignment DataFrame is the index (persist it as a table
  *     partitioned by `list_id` in production — probing then touches
  *     only nProbe/nLists of the data *files*);
  *  2. search: each query probes its `nProbe` nearest centroids
  *     (computed driver-side — the centroid table is tiny), and exact
  *     cosine top-k runs only against the probed lists.
  *
  * At 100 TB with nLists=4096, nProbe=64, a query scans ~1.6% of the
  * corpus instead of all of it; the candidate join is an equi-join on
  * list_id (shuffle-partitioned, no cross product). Compare `lshBucket`
  * (VectorFunctions) — IVF adapts to the data distribution, LSH does not
  * but needs no training pass.
  */
object IvfIndex {

  final case class Model(
      centroids: Array[Array[Double]],
      assignments: DataFrame, // idCol, vecCol, list_id
      idCol: String,
      vecCol: String)

  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, seed: Long = 42L): Model = {
    val withVec = corpus.select(col(idCol), col(vecCol))
      .withColumn("_v", array_to_vector(col(vecCol).cast("array<double>")))
    val km = new KMeans().setK(nLists).setSeed(seed)
      .setFeaturesCol("_v").setPredictionCol("list_id")
    val model = km.fit(withVec)
    val assignments = graft.ModelCheckpoint.pin(
      model.transform(withVec)
        .select(col(idCol), col(vecCol), col("list_id")))
    // pinned checkpoint: the index is reused across queries and must
    // survive the harnesses' per-query block sweeps
    Model(model.clusterCenters.map(_.toArray), assignments, idCol, vecCol)
  }

  /** Exact top-k within the probed lists. `queries` must be small (it is
    * collected to compute probe lists and broadcast into the join);
    * `idCol`/`vecCol` name the QUERY side's columns.
    *
    * Inputs are expected UNIT-NORMALIZED (standard IVF-cosine practice,
    * and what the embeddings fixture provides): centroids are probed by
    * squared L2 but candidates rank by cosine, and the two orders agree
    * only on the unit sphere — an unnormalized corpus vector with a
    * large magnitude can sit in an unprobed L2 cell despite a high
    * cosine, a loss beyond the documented nProbe approximation.
    * Callers with raw vectors must normalize before build AND search. */
  def search(model: Model, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    val qRows = queries.select(col(idCol), col(vecCol)).collect()
    require(qRows.length <= 10000, "query batch too large for driver-side probing")

    def nearestLists(v: Seq[Float]): Seq[Int] =
      model.centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < c.length) {
          val diff = c(j) - v(j); d += diff * diff; j += 1
        }
        (d, i)
      }.sortBy(_._1).take(nProbe).map(_._2).toSeq

    import spark.implicits._
    val probes = qRows.toSeq.map { r =>
      (r.getLong(0), r.getSeq[Float](1), nearestLists(r.getSeq[Float](1)))
    }.toDF("query_id", "qv", "probe_lists")
      .select(col("query_id"), col("qv"), explode(col("probe_lists")).as("list_id"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    model.assignments
      .select(col(model.idCol).as("cand_id"), col(model.vecCol).as("cv"),
        col("list_id"))
      .join(broadcast(probes), "list_id")
      .withColumn("cos", VectorFunctions.cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("rn"), col("cand_id"), col("cos"))
  }
}
