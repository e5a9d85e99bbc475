package graft.queries

import org.apache.spark.sql.functions._

/** SURVEY §3.1 — the SQL-text surface: CTEs, scalar/IN subqueries,
  * correlated subqueries, LATERAL joins. These run through `spark.sql`
  * (the engine's query facade, replacing the reference's DuckDB
  * pass-through) with oracle SQL that is near-identical text.
  */
object SqlQueries {

  private def sql(q: String): Q = (s, dir) => {
    graft.Tables.registerAll(s, dir)
    s.sql(q)
  }

  private val cteSql =
    s"""WITH big AS (
       |  SELECT o_custkey, COUNT(*) AS n_big
       |  FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey
       |)
       |SELECT c_mktsegment, COUNT(*) AS n_custs,
       |  CAST(SUM(n_big) AS BIGINT) AS total_big
       |FROM customer JOIN big ON c_custkey = o_custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  private val scalarSubSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  private val inSubSql =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_nationkey IN (
      |  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE')
      |ORDER BY s_suppkey""".stripMargin

  private val lateralSql =
    """SELECT c_custkey, m.max_price FROM customer,
      |LATERAL (SELECT MAX(o_totalprice) AS max_price
      |         FROM orders WHERE o_custkey = c_custkey) AS m
      |WHERE m.max_price IS NOT NULL
      |ORDER BY c_custkey""".stripMargin

  // correlated scalar subquery in SELECT list
  private val corrSubSql =
    """SELECT n_name,
      |  (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_custs
      |FROM nation ORDER BY n_name""".stripMargin

  // NATURAL JOIN (reference rewriter recognizes it, internal/api/query.go:72);
  // TPC-H columns are prefix-disjoint, so shared names come from aliasing
  private val naturalJoinSql =
    """SELECT nationkey, n_name, r_name FROM
      |  (SELECT n_nationkey AS nationkey, n_regionkey AS regionkey, n_name
      |   FROM nation)
      |NATURAL JOIN
      |  (SELECT r_regionkey AS regionkey, r_name FROM region)
      |ORDER BY nationkey""".stripMargin

  // WITH RECURSIVE (DuckDB-native, so the reference exposes it; Spark 4
  // runs it as UnionLoop): a generated weekly date spine outer-joined
  // to orders — weeks with no orders stay in the result with n=0. The
  // spine is 12 rows, so the non-equi join plans as a broadcast nested
  // loop over the fact scan: O(n), never O(n²). Only the `d + 7 days`
  // spelling differs per engine.
  private def recursiveCteSql(step: String) =
    s"""WITH RECURSIVE spine(d) AS (
       |  SELECT DATE '1995-01-02' AS d
       |  UNION ALL
       |  SELECT $step FROM spine WHERE d < DATE '1995-03-20'
       |)
       |SELECT CAST(d AS STRING) AS week_start,
       |  COUNT(o_orderkey) AS n_orders,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS wk_rev
       |FROM spine LEFT JOIN orders
       |  ON o_orderdate >= d AND o_orderdate < $step
       |GROUP BY d ORDER BY week_start""".stripMargin

  val queries: Map[String, Q] = Map(
    "q50_cte" -> sql(cteSql),
    "q51_subquery_scalar" -> sql(scalarSubSql),
    "q52_subquery_in" -> sql(inSubSql),
    "q53_lateral" -> sql(lateralSql),
    "q54_subquery_correlated" -> sql(corrSubSql),
    "q56_natural_join" -> sql(naturalJoinSql),
    "q59_recursive_cte" -> sql(recursiveCteSql("date_add(d, 7)"))
  )

  val oracles: Map[String, String] = Map(
    "q50_cte" -> cteSql,
    "q51_subquery_scalar" -> scalarSubSql,
    "q52_subquery_in" -> inSubSql,
    "q53_lateral" -> lateralSql,
    "q54_subquery_correlated" -> corrSubSql,
    "q56_natural_join" -> naturalJoinSql,
    "q59_recursive_cte" ->
      recursiveCteSql("CAST(d + INTERVAL 7 DAY AS DATE)")
        .replace("AS STRING", "AS VARCHAR")
  )
}
