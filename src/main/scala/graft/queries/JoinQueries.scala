package graft.queries

import org.apache.spark.sql.functions._

/** SURVEY §2.C — join surface: inner/left/full/cross/semi/anti, multiway,
  * non-equi (range) joins. The reference passes all of these to DuckDB;
  * here Catalyst picks the physical strategy. Scale notes:
  *  - dimension tables (region/nation/part/supplier/customer) are
  *    broadcast — at 100 TB the fact table never shuffles for these joins;
  *  - the multiway query is written fact-first so AQE can reorder;
  *  - the range join uses a tiny literal bounds table (broadcast BNLJ).
  */
object JoinQueries {

  val queries: Map[String, Q] = Map(
    // inner equi-join, explicitly broadcast dimension
    "q10_join_inner" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").where(col("p_size") < 10)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_extendedprice")).as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("p_brand"))),

    // TPC-H Q5-style multiway star join: fact + 4 broadcast dims
    "q11_join_multiway" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(dsumRev(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("n_name"))),

    // left outer: every customer, order count (0 for orderless)
    "q12_join_left" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))),

    // left semi == EXISTS
    "q13_join_semi" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").where(col("l_quantity") > 49)
      t(s, dir, "orders")
        .join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // left anti == NOT EXISTS: parts never ordered
    "q14_join_anti" -> ((s, dir) =>
      t(s, dir, "part")
        .join(t(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))),

    // full outer of two pre-aggregated sides (customer/supplier per nation)
    "q15_join_full" -> ((s, dir) => {
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val su = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk2"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, col("nk") === col("nk2"), "full")
        .select(
          coalesce(col("nk"), col("nk2")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    }),

    // cross join (tiny x tiny)
    "q16_join_cross" -> ((s, dir) =>
      t(s, dir, "nation").crossJoin(t(s, dir, "region"))
        .select(col("n_name"), col("r_name"))
        .orderBy(col("n_name"), col("r_name"))),

    // fact⋈fact via co-bucketed tables: both sides stored bucketed+sorted
    // on the join key, so the sort-merge join runs with ZERO exchanges —
    // the write-time shuffle is amortized over every later join (the
    // 100 TB lineitem⋈orders path; PlanSpec pins the no-Exchange shape)
    "q19_join_bucketed" -> ((s, dir) => {
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val (liT, oT) = (s"lineitem_bkt_$tag", s"orders_bkt_$tag")
      graft.operators.Bucketing.ensureBucketed(s, liT, s"/tmp/graft_bkt_$tag/li",
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount")),
        "l_orderkey", buckets = 32)
      graft.operators.Bucketing.ensureBucketed(s, oT, s"/tmp/graft_bkt_$tag/o",
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        "o_orderkey", buckets = 32)
      graft.operators.Bucketing.bucketedJoin(s, liT, "l_orderkey", oT, "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dsumRev(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // non-equi range join against literal bucket bounds (broadcast BNLJ)
    "q17_join_range" -> ((s, dir) => {
      val buckets = s.createDataFrame(Seq(
        (0.0, 50000.0), (50000.0, 100000.0), (100000.0, 200000.0),
        (200000.0, 400000.0), (400000.0, 1e9))).toDF("lo", "hi")
      t(s, dir, "orders")
        .join(broadcast(buckets),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("lo"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("lo"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q10_join_inner" ->
      s"""SELECT p_brand, ${oSum("l_extendedprice")} AS revenue, COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_size < 10 GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q11_join_multiway" ->
      s"""SELECT n_name, ${oSumRev("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q12_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q13_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q14_join_anti" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,

    "q15_join_full" ->
      """SELECT COALESCE(nk, nk2) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS nk2, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
        |ON nk = nk2 ORDER BY nationkey""".stripMargin,

    "q16_join_cross" ->
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        |ORDER BY n_name, r_name""".stripMargin,

    "q19_join_bucketed" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         |  ${oSumRev("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q17_join_range" ->
      s"""SELECT lo, COUNT(*) AS n, ${oSum("o_totalprice")} AS sum_price
         |FROM orders JOIN (VALUES (0.0, 50000.0), (50000.0, 100000.0),
         |  (100000.0, 200000.0), (200000.0, 400000.0), (400000.0, 1000000000.0))
         |  AS b(lo, hi)
         |ON o_totalprice >= lo AND o_totalprice < hi
         |GROUP BY lo ORDER BY lo""".stripMargin
  )
}
