package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second wave of SQL-surface coverage: statistical aggregates
  * (decimal-exact spellings), collected/ordered string aggregation,
  * RANGE window frames with first/last/nth, ClickBench-style LIKE
  * predicate stacks, and ALL-variants of set operations.
  */
object ExtraQueries {

  val queries: Map[String, Q] = Map(
    // variance/stddev via explicit decimal sums (identical arithmetic in
    // both engines; the builtin stddev's float accumulation order is not)
    "q07_agg_stats" -> ((s, dir) => {
      val x = dec(col("l_quantity"))
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(x).cast("double").as("sum_x"),
          sum(x * x).cast("double").as("sum_xx"))
        .select(
          col("l_returnflag"), col("n"),
          round((col("sum_xx") - col("sum_x") * col("sum_x") / col("n")) /
            (col("n") - 1), 4).as("var_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // ordered collect + string agg (deterministic via sort)
    "q08_agg_collect" -> ((s, dir) =>
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"))),

    // RANGE frame + first/last/nth over an ordered window
    "q25_window_range" -> ((s, dir) => {
      val wRange = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-1000L, 1000L)
      val wRows = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .withColumn("n_near", count(lit(1)).over(wRange))
        .withColumn("cheapest", first(col("o_orderkey")).over(wRows))
        .withColumn("priciest", last(col("o_orderkey")).over(wRows))
        .select(col("o_orderkey"), col("o_orderpriority"), col("n_near"),
          col("cheapest"), col("priciest"))
        .orderBy(col("o_orderkey"))
    }),

    // ClickBench Q23-style predicate stack: LIKE / NOT LIKE / <> '' / ILIKE
    // (the reference reorders these textually — like_optimizer.go; Catalyst
    // costs and reorders conjuncts natively)
    "q35_like_stack" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(col("text").like("%query%") &&
          !col("source").like("%src1%") &&
          col("lang") =!= "" &&
          col("lang").ilike("E%"))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))),

    // UNION / UNION ALL / INTERSECT ALL / EXCEPT ALL
    "q36_setops_all" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val b = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val inter = a.intersectAll(b).groupBy(col("k")).agg(count(lit(1)).as("n"))
        .withColumn("tag", lit("inter_all"))
      val exc = a.exceptAll(b).groupBy(col("k")).agg(count(lit(1)).as("n"))
        .withColumn("tag", lit("except_all"))
      inter.unionByName(exc)
        .select(col("tag"), col("k"), col("n"))
        .orderBy(col("tag"), col("k"))
    }),

    // data-quality column profile — the "what's actually in this
    // table" report every ingestion pipeline runs before training on a
    // new source: per column, nulls, blank strings, distinct count,
    // value-length bounds. ONE scan: Spark plans the multi-distinct
    // aggregate through a single Expand (no per-column passes), and
    // the 5-metric×5-column row pivots to long form with stack() —
    // driver-side nothing. String lengths measure the CAST text (cast
    // of int64 is digit-identical in both engines).
    "q148_data_profile" -> ((s, dir) => {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val d = t(s, dir, "documents")
      val aggs = cols.flatMap { c =>
        val sc = col(c).cast("string")
        Seq(count(col(c)).as(s"cnt_$c"),
          countDistinct(col(c)).as(s"dist_$c"),
          sum(when(trim(sc) === "", 1L).otherwise(0L)).as(s"emp_$c"),
          min(length(sc)).as(s"minl_$c"),
          max(length(sc)).as(s"maxl_$c"))
      }
      val row = d.agg(count(lit(1)).as("n_rows"), aggs: _*)
      val stackArgs = cols.map(c =>
        s"'$c', cnt_$c, dist_$c, emp_$c, minl_$c, maxl_$c").mkString(", ")
      row.select(col("n_rows"), expr(
          s"stack(${cols.length}, $stackArgs) AS " +
            "(col_name, n_present, n_distinct, n_blank, min_len, max_len)"))
        .select(col("col_name"), col("n_rows"),
          (col("n_rows") - col("n_present")).as("n_null"),
          col("n_distinct"), col("n_blank"),
          col("min_len").cast("long").as("min_len"),
          col("max_len").cast("long").as("max_len"))
        .orderBy(col("col_name"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q07_agg_stats" ->
      """SELECT l_returnflag, cnt AS n,
        |  round((sum_xx - sum_x * sum_x / cnt) / (cnt - 1), 4) AS var_qty
        |FROM (SELECT l_returnflag,
        |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_x,
        |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |                 CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_xx,
        |        COUNT(*) AS cnt
        |      FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    "q08_agg_collect" ->
      """SELECT n_regionkey,
        |  array_to_string(list_sort(list(n_name)), ',') AS nations,
        |  COUNT(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q25_window_range" ->
      """SELECT o_orderkey, o_orderpriority,
        |  COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_near,
        |  FIRST_VALUE(o_orderkey) OVER w AS cheapest,
        |  LAST_VALUE(o_orderkey) OVER w AS priciest
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "q35_like_stack" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE text LIKE '%query%' AND source NOT LIKE '%src1%'
        |  AND lang <> '' AND lang ILIKE 'E%'
        |ORDER BY doc_id""".stripMargin,

    "q36_setops_all" ->
      """WITH a AS (SELECT o_custkey AS k FROM orders),
        |     b AS (SELECT c_custkey AS k FROM customer)
        |SELECT 'inter_all' AS tag, k, COUNT(*) AS n
        |FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k
        |UNION ALL
        |SELECT 'except_all' AS tag, k, COUNT(*) AS n
        |FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k
        |ORDER BY tag, k""".stripMargin,

    "q148_data_profile" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val arms = cols.map { c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT($c) AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(SUM(CASE WHEN trim(CAST($c AS VARCHAR)) = '' THEN 1
           |           ELSE 0 END) AS BIGINT) AS n_blank,
           |  CAST(MIN(length(CAST($c AS VARCHAR))) AS BIGINT) AS min_len,
           |  CAST(MAX(length(CAST($c AS VARCHAR))) AS BIGINT) AS max_len
           |FROM documents""".stripMargin
      }
      arms.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    }
  )
}
