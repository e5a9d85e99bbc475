package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.E — window surface: ranking, lag/lead, running frames, and
  * the reference's dedup idiom `ROW_NUMBER() OVER (PARTITION BY tags, time
  * ORDER BY ...) = 1` (compaction/dedup.go:219-233, expressed there via
  * QUALIFY — Spark has no QUALIFY, so it's a filter over the windowed
  * column, same result).
  * All ORDER BYs carry unique tie-breaks so ranking is deterministic.
  */
object WindowQueries {

  val queries: Map[String, Q] = Map(
    // ranking family: top-5 line items per return flag by price
    // top-5 per return flag: two-phase TopKPerGroup (per-partition bounded
    // heaps, then an exact window over ≤ partitions·k survivors) instead of
    // sorting the whole fact table in 3 window tasks. rank/dense_rank stay
    // exact on the reduced set: the ordering is total (unique tie-break),
    // so every surviving row's rank equals its row number.
    "q20_window_rank" -> ((s, dir) => {
      val top = graft.operators.TopKPerGroup.topK(
        t(s, dir, "lineitem").select(
          col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice")),
        groupCols = Seq("l_returnflag"), orderCol = "l_extendedprice",
        tieCols = Seq("l_orderkey", "l_linenumber"), k = 5)
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      top
        .withColumn("rk", rank().over(w))
        .withColumn("drk", dense_rank().over(w))
        .select(col("l_returnflag"), col("rn"), col("rk"), col("drk"),
          col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_returnflag"), col("rn"))
    }),

    // lag/lead over event time per user
    "q21_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("value"),
          col("prev_value"), col("next_type"))
        .orderBy(col("event_id"))
    }),

    // running frame: cumulative order value per customer
    "q22_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("running_price", sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select(col("o_orderkey"), col("o_custkey"), col("running_price"))
        .orderBy(col("o_orderkey"))
    }),

    // the reference's last-write-wins dedup operator: latest event per
    // (user_id, event_type) — tags=(user_id,event_type), time=ts
    "q23_window_dedup" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // distribution windows + IGNORE NULLS navigation: percent_rank /
    // cume_dist per priority, first non-'O' status carried per frame
    "q29_window_distribution" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .withColumn("first_nonO",
          first(nullif(col("o_orderstatus"), lit("O")), ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .where(col("o_orderkey") % 10 === 0) // thin the output, keep the math
        .select(col("o_orderkey"), col("o_orderpriority"), col("pr"), col("cd"),
          col("first_nonO"))
        .orderBy(col("o_orderkey"))
    }),

    // ntile + percent_rank (analytic extras the SQL surface exposes)
    // global NTILE via GlobalRank (range partition + offset stamping) —
    // the window form's empty PARTITION BY would sort the whole table in
    // one task; this shape stays parallel at any scale
    "q24_window_ntile" -> ((s, dir) =>
      graft.operators.GlobalRank.ntile(
          t(s, dir, "orders").select(col("o_totalprice"), col("o_orderkey")),
          Seq(col("o_totalprice"), col("o_orderkey")), 4, bucketCol = "quartile")
        .groupBy(col("quartile"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("quartile")))
  )

  val oracles: Map[String, String] = Map(
    "q20_window_rank" ->
      """SELECT l_returnflag, rn, rk, drk, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |  ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_returnflag
        |               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber))
        |WHERE rn <= 5 ORDER BY l_returnflag, rn""".stripMargin,

    "q21_window_lag" ->
      """SELECT event_id, user_id, value,
        |  LAG(value, 1) OVER w AS prev_value,
        |  LEAD(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY event_id""".stripMargin,

    "q22_window_running" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  AS running_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q23_window_dedup" ->
      """SELECT user_id, event_type, event_id, value FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "q29_window_distribution" ->
      """SELECT o_orderkey, o_orderpriority, pr, cd, first_nonO
        |FROM (SELECT o_orderkey, o_orderpriority,
        |  round(PERCENT_RANK() OVER w, 6) AS pr,
        |  round(CUME_DIST() OVER w, 6) AS cd,
        |  FIRST_VALUE(nullif(o_orderstatus, 'O') IGNORE NULLS) OVER
        |    (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_nonO
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice, o_orderkey))
        |WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""".stripMargin,

    "q24_window_ntile" ->
      s"""SELECT quartile, COUNT(*) AS n, ${oSum("o_totalprice")} AS sum_price
         |FROM (SELECT o_totalprice,
         |  NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
         |  FROM orders)
         |GROUP BY quartile ORDER BY quartile""".stripMargin
  )
}
