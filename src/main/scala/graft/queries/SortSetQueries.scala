package graft.queries

import org.apache.spark.sql.expressions.Window
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
        .orderBy(asc_nulls_first("maybe"))),

    // TOP k WITH TIES (ANSI FETCH FIRST k ROWS WITH TIES): rank() ≤ k
    // keeps every row tying the kth value — the semantics LIMIT
    // silently breaks when the cutoff lands mid-tie. Integer cents make
    // the tie predicate exact. Pre-aggregate FIRST: the stream collapses
    // to (event_type, value) counts map-side, so the window shuffles and
    // sorts only distinct values per type, never the raw stream; the raw
    // rank of a value is 1 + the tie counts of all strictly-greater
    // values (a running window SUM over the distinct frame).
    "q150_topk_ties" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("c").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "events")
        .select(col("event_type"),
          (dec(col("value")) * 100).cast("long").as("c"))
        .groupBy(col("event_type"), col("c"))
        .agg(count(lit(1)).as("n_tied"))
        .withColumn("rk", lit(1L) + coalesce(sum(col("n_tied")).over(w), lit(0L)))
        .where(col("rk") <= 5)
        .select(col("event_type"), col("rk"),
          (col("c").cast("double") / 100.0).as("value"), col("n_tied"))
        .orderBy(col("event_type"), col("rk"), col("value"))
    }),

    // cumulative adopters curve: distinct users ever seen, per day —
    // q138's min-first-occurrence idiom on the time axis (one pass;
    // never a per-day distinct recount). Grid left-join keeps quiet
    // days on the curve.
    "q151_adopters_curve" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      val firsts = ev.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
        .groupBy(col("d0")).agg(count(lit(1)).as("new_users"))
      val bounds = ev.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      val grid = bounds.select(
        explode(sequence(col("mn"), col("mx"), expr("interval 1 day"))).as("day"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(firsts, col("day") === col("d0"), "left")
        .select(col("day"), coalesce(col("new_users"), lit(0L)).as("new_users"))
        .withColumn("total_users", sum(col("new_users")).over(w))
        .orderBy(col("day"))
    })
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
         |FROM lineitem GROUP BY maybe ORDER BY maybe ASC NULLS FIRST""".stripMargin,

    "q150_topk_ties" ->
      """WITH c AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |r AS (SELECT event_type, c,
        |    RANK() OVER (PARTITION BY event_type ORDER BY c DESC) AS rk
        |  FROM c)
        |SELECT event_type, rk, CAST(c AS DOUBLE) / 100.0 AS value,
        |  COUNT(*) AS n_tied
        |FROM r WHERE rk <= 5
        |GROUP BY event_type, rk, c
        |ORDER BY event_type, rk, value""".stripMargin,

    "q151_adopters_curve" ->
      """WITH ev AS (SELECT user_id,
        |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events),
        |f AS (SELECT d0, COUNT(*) AS new_users FROM
        |    (SELECT user_id, MIN(day) AS d0 FROM ev GROUP BY user_id)
        |  GROUP BY d0),
        |b AS (SELECT MIN(day) mn, MAX(day) mx FROM ev),
        |g AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
        |  FROM b)
        |SELECT g.day, COALESCE(new_users, 0) AS new_users,
        |  CAST(SUM(COALESCE(new_users, 0)) OVER (ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS total_users
        |FROM g LEFT JOIN f ON g.day = f.d0
        |ORDER BY g.day""".stripMargin
  )
}
