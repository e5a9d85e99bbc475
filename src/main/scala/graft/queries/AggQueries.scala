package graft.queries

import org.apache.spark.sql.functions._

/** SURVEY §2.D — aggregation surface: multi-key GROUP BY, HAVING,
  * COUNT DISTINCT, conditional aggregates, ROLLUP/CUBE grouping sets.
  * All execution is native Spark hash aggregation (partial+final,
  * map-side combine) — the reference delegates these to DuckDB wholesale.
  */
object AggQueries {

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 style: multi-key agg over the fact table
    "q01_agg_groupby" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // COUNT(DISTINCT), conditional agg, min/max
    "q02_agg_distinct" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
          dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderpriority"))),

    // GROUP BY + HAVING
    "q03_agg_having" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .where(col("n_items") > 20)
        .orderBy(col("l_suppkey"))),

    // ROLLUP with grouping_id — subtotal rows have NULL keys
    "q04_agg_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // explicit GROUPING SETS (neither rollup nor cube): per-flag,
    // per-status, and grand-total rows only
    "q28_agg_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem") // registers views
      s.sql(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               |  ${oSum("l_quantity")} AS sum_qty,
               |  grouping_id(l_returnflag, l_linestatus) AS gid
               |FROM lineitem
               |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
               |ORDER BY gid, l_returnflag ASC NULLS FIRST,
               |  l_linestatus ASC NULLS FIRST""".stripMargin)
    }),

    // CUBE over two order dimensions
    "q05_agg_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(col("gid"), asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))),

    // metadata-only count: Parquet footer row-group counts, no data scan
    // (reference: SUM(num_rows) over parquet footers, dedup.go:261-271)
    "q06_agg_count_star" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("n")))
  )

  val oracles: Map[String, String] = Map(
    "q01_agg_groupby" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${oSum("l_quantity")} AS sum_qty,
         |  ${oSum("l_extendedprice")} AS sum_base_price,
         |  ${oAvg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_agg_distinct" ->
      s"""SELECT o_orderpriority,
         |  COUNT(DISTINCT o_custkey) AS n_custs,
         |  COUNT(*) AS n_orders,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
         |  ${oSum("o_totalprice")} AS sum_price,
         |  MIN(o_orderkey) AS min_key,
         |  MAX(o_orderkey) AS max_key
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q03_agg_having" ->
      s"""SELECT l_suppkey, COUNT(*) AS n_items, ${oSum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 20
         |ORDER BY l_suppkey""".stripMargin,

    "q04_agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${oSum("l_quantity")} AS sum_qty,
         |  GROUPING(l_returnflag, l_linestatus) AS gid
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q28_agg_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${oSum("l_quantity")} AS sum_qty,
         |  GROUPING(l_returnflag, l_linestatus) AS gid
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY gid, l_returnflag ASC NULLS FIRST,
         |  l_linestatus ASC NULLS FIRST""".stripMargin,

    "q05_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  GROUPING(o_orderstatus, o_orderpriority) AS gid
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q06_agg_count_star" -> "SELECT COUNT(*) AS n FROM lineitem"
  )
}
