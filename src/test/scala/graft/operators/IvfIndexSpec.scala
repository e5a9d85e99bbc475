package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def bruteForceTopK(queries: org.apache.spark.sql.DataFrame, k: Int) = {
    val c = emb.where(col("vec_id") >= 3)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    c.crossJoin(broadcast(queries))
      .withColumn("cos", VectorFunctions.cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("rn"), col("cand_id"))
  }

  test("full-probe IVF search equals brute force; partial probe has recall") {
    val model = IvfIndex.build(emb.where(col("vec_id") >= 3),
      "vec_id", "embedding", nLists = 8)
    assert(model.centroids.length == 8)
    val queries = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

    // probing ALL lists == exact search
    val full = IvfIndex.search(model, queries.withColumnRenamed("qv", "embedding"),
        "query_id", "embedding", k = 5, nProbe = 8)
      .select("query_id", "rn", "cand_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = bruteForceTopK(queries, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full == exact, "nProbe == nLists must match brute force exactly")

    // partial probe: at least 1/3 of exact top-5 retrieved per query
    val partial = IvfIndex.search(model, queries.withColumnRenamed("qv", "embedding"),
        "query_id", "embedding", k = 5, nProbe = 2)
      .select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactIds = exact.map { case (q, _, c) => (q, c) }
    val recall = exactIds.count(partial.contains).toDouble / exactIds.size
    assert(recall >= 0.3, s"nProbe=2/8 recall too low: $recall")
  }
}
