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
    * contains no Exchange on either side. The `merge` hint keeps the
    * join sort-merge even when one side would fit a broadcast — the
    * point of bucketing is the shuffle-free fact-fact path, and at real
    * scale neither side broadcasts anyway. */
  def bucketedJoin(spark: SparkSession, leftTable: String, leftKey: String,
      rightTable: String, rightKey: String): DataFrame =
    spark.table(leftTable).hint("merge").join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))

  /** Idempotently materialize `df` as an external bucketed table at
    * `path`. The bucket layout is written ONCE; later sessions (whose
    * in-memory catalog lost the definition) re-register the table over
    * the existing files instead of rewriting them — the write-time
    * shuffle is paid once and amortized over every later join. */
  def ensureBucketed(spark: SparkSession, table: String, path: String,
      df: => DataFrame, key: String, buckets: Int): Unit = {
    if (spark.catalog.tableExists(table)) return
    val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(success)) {
      spark.sql(s"CREATE TABLE $table (${df.schema.toDDL}) USING PARQUET " +
        s"CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS " +
        s"LOCATION '$path'")
    } else {
      df.write.mode(SaveMode.Overwrite).format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .option("compression", "zstd").option("path", path)
        .saveAsTable(table)
    }
  }
}
