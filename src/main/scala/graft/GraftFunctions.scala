package graft

import org.apache.spark.sql.SparkSession
import graft.functions.TimeBucket

/** SQL-function registration for graft's custom Catalyst expressions. */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "time_bucket",
      exprs => TimeBucket(exprs(0), exprs(1)),
      "built-in")
    graft.plans.TimePartitionPruning.install(spark)
  }
}
