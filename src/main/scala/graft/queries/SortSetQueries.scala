package graft.queries

import org.apache.spark.sql.functions._

/** SURVEY §2.F (sorts/limits/top-k) + §2.G (set operations) + §2.B
  * (filter/projection pushdown). Top-k compiles to TakeOrderedAndProject
  * (no global sort); filters/projections reach the Parquet scan
  * (PushedFilters/ReadSchema — verified in PlanSpec).
  */
object SortSetQueries {

  val queries: Map[String, Q] = Map(
    // filter + projection pushdown to the scan
    "q30_filter_project" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1998-06-01").cast("timestamp") &&
               col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // top-k: ORDER BY ... LIMIT -> TakeOrderedAndProject
    "q31_topk" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .limit(100)),

    // UNION ALL / INTERSECT / EXCEPT composed, tagged
    "q32_setops" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
      cn.intersect(sn).withColumn("tag", lit("both"))
        .unionAll(cn.except(sn).withColumn("tag", lit("cust_only")))
        .unionAll(sn.except(cn).withColumn("tag", lit("supp_only")))
        .select(col("tag"), col("nk"))
        .orderBy(col("tag"), col("nk"))
    }),

    // DISTINCT over a projection
    "q33_distinct" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority")).distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))),

    // NULL semantics: null-safe equality (<=> / IS NOT DISTINCT FROM),
    // COUNT(*) vs COUNT(col), grouping by a nullable key, null ordering
    "q55_null_semantics" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(nullif(col("l_returnflag"), lit("A")).as("maybe"),
          col("l_quantity"))
        .groupBy(col("maybe"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("maybe")).as("n_nonnull"),
          sum((col("maybe") <=> lit(null)).cast("long")).as("n_nullsafe_null"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("maybe")))
  )

  val oracles: Map[String, String] = Map(
    "q30_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-06-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q31_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q32_setops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
        |     sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
        |SELECT 'both' AS tag, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
        |UNION ALL
        |SELECT 'cust_only' AS tag, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
        |UNION ALL
        |SELECT 'supp_only' AS tag, nk FROM (SELECT nk FROM sn EXCEPT SELECT nk FROM cn)
        |ORDER BY tag, nk""".stripMargin,

    "q33_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q55_null_semantics" ->
      s"""SELECT NULLIF(l_returnflag, 'A') AS maybe,
         |  COUNT(*) AS n_rows,
         |  COUNT(NULLIF(l_returnflag, 'A')) AS n_nonnull,
         |  CAST(SUM(CAST(NULLIF(l_returnflag, 'A') IS NOT DISTINCT FROM NULL AS BIGINT))
         |    AS BIGINT) AS n_nullsafe_null,
         |  ${oSum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY maybe ORDER BY maybe ASC NULLS FIRST""".stripMargin
  )
}
