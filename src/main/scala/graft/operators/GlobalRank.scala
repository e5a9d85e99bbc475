package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact global ranking without a single-task sort.
  *
  * `ntile(k) OVER (ORDER BY ...)` — an empty PARTITION BY — executes as
  * ONE window task holding every row: the known global-sort anti-pattern
  * (SCALE.md). The scalable shape is the classic zip-with-index plan:
  *
  *   1. `repartitionByRange` on the sort key (sampled range exchange —
  *      partitions are globally ordered),
  *   2. sort within each partition (parallel),
  *   3. stamp exact global row numbers = partition offset + local index
  *      (`RDD.zipWithIndex`: a per-partition count pass, then a stamp
  *      pass — both parallel, nothing ever gathers to one task),
  *   4. bucket arithmetic on the row number reproduces NTILE's exact
  *      semantics (first `n % k` buckets get the extra row).
  */
object GlobalRank {

  /** `df` + a global row-number column (1-based, ordered by sortCols). */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column],
      rnCol: String = "rn", partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint() // zipWithIndex runs two passes; sort once
    val schema = sorted.schema.add(rnCol, LongType, nullable = false)
    val stamped = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(stamped, schema)
  }

  /** Default size cutover: below this the single-task window sort is
    * cheaper than the multi-pass distributed stamping. */
  val WindowCutoverBytes: Long = 256L * 1024 * 1024

  /** Exact NTILE(k) over a global ordering.
    *
    * Size-adaptive: inputs whose plan-estimated size fits comfortably in
    * one task (< `cutoverBytes`) use the plain window (one sort, no
    * extra passes — faster at small scale); larger inputs switch to the
    * distributed offset-stamping shape, which never gathers the table
    * into a single task. Both produce identical results
    * (GlobalRankSpec). */
  def ntile(df: DataFrame, sortCols: Seq[Column], k: Int,
      bucketCol: String = "bucket", partitions: Int = 0,
      cutoverBytes: Long = WindowCutoverBytes): DataFrame = {
    require(k > 0, "k must be positive")
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes >= 0 && estBytes < BigInt(cutoverBytes)) {
      val w = org.apache.spark.sql.expressions.Window.orderBy(sortCols: _*)
      df.withColumn(bucketCol, org.apache.spark.sql.functions.ntile(k).over(w))
    } else {
      val sorted = df
        .repartitionByRange(
          if (partitions > 0) partitions
          else df.sparkSession.sparkContext.defaultParallelism,
          sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .localCheckpoint() // consumed by count + two zipWithIndex passes
      val n = sorted.count()
      // NTILE semantics: first (n % k) buckets hold ceil(n/k) rows
      val base = n / k
      val rem = n % k
      val bigCut = (base + 1) * rem
      val spark = df.sparkSession
      val schema = sorted.schema.add("_grn", LongType, nullable = false)
      val withRn = spark.createDataFrame(
        sorted.rdd.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ (i + 1L))
        }, schema)
      val grn = col("_grn")
      val bucket =
        if (base == 0) grn.cast("int") // fewer rows than buckets
        else when(grn <= bigCut, ((grn - 1) / (base + 1)).cast("int") + 1)
          .otherwise((lit(rem) + (grn - bigCut - 1) / base).cast("int") + 1)
      withRn.withColumn(bucketCol, bucket).drop("_grn")
    }
  }
}
