package graft.queries

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Reshaping surface: PIVOT, UNPIVOT, and deterministic hash-sampling
  * (the production-stable alternative to TABLESAMPLE — the same rows
  * are sampled on every engine and every run, which is what a
  * training-data pipeline needs for reproducible subsets).
  */
object ReshapeQueries {

  private val statuses = Seq("F", "O", "P")

  val queries: Map[String, Q] = Map(
    // PIVOT: order counts by priority × status
    "q37_pivot" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", statuses)
        .agg(count(lit(1)))
        .na.fill(0L, statuses)
        .withColumnsRenamed(statuses.map(st => st -> s"n_$st").toMap)
        .orderBy(col("o_orderpriority"))),

    // UNPIVOT/melt: wide per-part prices to long (attribute, value)
    "q38_unpivot" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"), col("p_size").cast("double").as("p_size_d"))
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size_d")),
          "attribute", "value")
        .orderBy(col("p_partkey"), col("attribute"))),

    // deterministic hash-sample: ~1/16 of documents, stable everywhere
    "q39_hash_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(pmod(TextFunctions.charFingerprint(col("text")), lit(16)) === 0)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")))
  )

  val oracles: Map[String, String] = Map(
    "q37_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q38_unpivot" ->
      """SELECT p_partkey, attribute, value FROM (
        |  SELECT p_partkey, 'p_retailprice' AS attribute, p_retailprice AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_size_d' AS attribute, CAST(p_size AS DOUBLE) AS value FROM part)
        |ORDER BY p_partkey, attribute""".stripMargin,

    "q39_hash_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${TextFunctions.charFingerprintSql("text")} % 16 = 0
         |ORDER BY doc_id""".stripMargin
  )
}
