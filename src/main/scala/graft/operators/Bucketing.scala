package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables — the shuffle-free fact-to-fact join path.
  *
  * Broadcast joins cover dimension tables; when two FACT tables join
  * repeatedly on the same key (lineitem⋈orders at 100 TB), the win is to
  * store both bucketed (and sorted) by the join key: Spark's scan then
  * reports the hash-partitioning to the planner and the sort-merge join
  * runs with NO Exchange and NO per-query sort — the shuffle is paid
  * once at write time, amortized over every subsequent join/aggregation
  * on that key.
  *
  * Bucketing requires catalog-persistent tables (bucket metadata lives
  * in the table definition, not the files), so these helpers write into
  * the session catalog/warehouse rather than the plain parquet dirs the
  * measurement catalog manages.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted catalog table. */
  def save(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("compression", "zstd")
      .saveAsTable(table)

  /** Co-bucket two fact tables on their join keys (same bucket count —
    * required for the co-located join). */
  def saveCoBucketed(left: DataFrame, leftTable: String, leftKey: String,
      right: DataFrame, rightTable: String, rightKey: String,
      buckets: Int): Unit = {
    save(left, leftTable, leftKey, buckets)
    save(right, rightTable, rightKey, buckets)
  }

  /** Join two co-bucketed tables; with matching bucket specs the plan
    * contains no Exchange on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String, leftKey: String,
      rightTable: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
