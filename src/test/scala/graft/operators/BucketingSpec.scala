package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("co-bucketed fact-fact join runs with zero exchanges") {
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    // at test scale Spark would broadcast the small side, hiding the
    // bucketed path; disable broadcast to exercise the fact-fact shape
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    Bucketing.saveCoBucketed(
      li, "lineitem_bkt", "l_orderkey",
      o, "orders_bkt", "o_orderkey", buckets = 8)

    val joined = Bucketing.bucketedJoin(spark,
        "lineitem_bkt", "l_orderkey", "orders_bkt", "o_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))

    // join itself must not shuffle either side: the only shuffle stage in
    // the FINAL plan (tree lines only — the formatted detail repeats
    // nodes, and the Initial Plan section would double-count) is the one
    // for the final groupBy
    val shuffles = plan.linesIterator.count(_.contains("+- ShuffleQueryStage"))
    assert(shuffles <= 1, s"expected only the aggregation shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")

    // correctness: equals the plain join
    val want = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
    val got = joined.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
    assert(got == want)

    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
