package graft.queries

import graft.functions.TimeBucket.time_bucket
import org.apache.spark.sql.functions._

/** SURVEY §2.H — scalar-function surface: time_bucket (custom Catalyst
  * expression, codegen'd int64 math — the reference's flagship rewrite,
  * query.go:366-443), date_trunc, extract, string functions, regexp,
  * JSON access, CASE/COALESCE/TRY_CAST, generated series.
  * Oracles for time_bucket use the exact epoch-floor arithmetic the
  * reference feeds DuckDB, so semantics (Unix-epoch origin) match.
  */
object FunctionQueries {

  val queries: Map[String, Q] = Map(
    // time_bucket: 15-minute tumbling buckets over event time
    "q40_time_bucket" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(time_bucket(expr("INTERVAL '15' MINUTE"), col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("bucket"))),

    // date_trunc to day + hour-of-day histogram
    "q41_date_trunc" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("day"), col("hr"))),

    // extract parts from order dates
    "q42_extract" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("yr"), col("mo"))),

    // string functions: upper/substring/length/concat/split_part + LIKE
    "q43_string_funcs" -> ((s, dir) =>
      t(s, dir, "customer")
        .where(col("c_name").like("%1%"))
        .select(
          col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_upper"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          length(col("c_name")).as("name_len"),
          concat_ws("/", col("c_mktsegment"), col("c_name")).as("seg_name"),
          split_part(col("c_name"), lit("#"), lit(2)).as("name_num"))
        .orderBy(col("c_custkey"))),

    // regexp_extract / regexp_replace (the reference rewrites the
    // URL-domain idiom to split_part/substr — regex_rewriter.go:12-125;
    // Catalyst codegens regexp directly, so no rewrite is needed)
    "q44_regexp" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          regexp_extract(col("source"), "src([0-9]+)", 1).cast("long").as("src_num"),
          regexp_replace(substring(col("text"), 1, 20), " ", "_").as("head_snake"))
        .orderBy(col("doc_id"))),

    // JSON field access on the event props column
    "q45_json" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k"))),

    // CASE / COALESCE / TRY_CAST
    "q46_case_trycast" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("size_class"),
          expr("TRY_CAST(o_orderpriority AS BIGINT)").as("prio_int"),
          coalesce(expr("TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT)"), lit(-1L))
            .as("prio_num"))
        .orderBy(col("o_orderkey"))),

    // array higher-order functions over embedding vectors:
    // filter / exists / transform / sequential fold
    "q49_array_hofs" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(
          col("vec_id"),
          size(filter(col("embedding"), x => x > 0f)).as("n_pos"),
          exists(col("embedding"), x => x > lit(0.2f)).as("has_big"),
          size(array_distinct(transform(col("embedding"),
            x => (x > 0f).cast("int")))).as("n_sign_kinds"),
          round(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + when(x > 0f, x.cast("double")).otherwise(0.0)), 6)
            .as("sum_pos"))
        .orderBy(col("vec_id"))),

    // generated series (explode(sequence(...)) == generate_series)
    "q47_series" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.range(1, 51).toDF("n")
        .select(col("n"), (col("n") * col("n")).as("sq"),
          (col("n") % 7).as("m7"))
        .orderBy(col("n"))
    })
  )

  private val bucketUs = 15L * 60 * 1000000

  val oracles: Map[String, String] = Map(
    "q40_time_bucket" ->
      s"""SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // $bucketUs) * $bucketUs) AS bucket,
         |  COUNT(*) AS n, ${oSum("value")} AS sum_value
         |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q41_date_trunc" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |  EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hr, COUNT(*) AS n
        |FROM events GROUP BY day, hr ORDER BY day, hr""".stripMargin,

    "q42_extract" ->
      s"""SELECT EXTRACT(year FROM o_orderdate) AS yr,
         |  EXTRACT(month FROM o_orderdate) AS mo,
         |  COUNT(*) AS n, ${oSum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin,

    "q43_string_funcs" ->
      """SELECT c_custkey, UPPER(c_mktsegment) AS seg_upper,
        |  SUBSTRING(c_name, 1, 8) AS name_prefix,
        |  LENGTH(c_name) AS name_len,
        |  CONCAT_WS('/', c_mktsegment, c_name) AS seg_name,
        |  SPLIT_PART(c_name, '#', 2) AS name_num
        |FROM customer WHERE c_name LIKE '%1%' ORDER BY c_custkey""".stripMargin,

    "q44_regexp" ->
      """SELECT doc_id,
        |  CAST(regexp_extract(source, 'src([0-9]+)', 1) AS BIGINT) AS src_num,
        |  regexp_replace(SUBSTRING(text, 1, 20), ' ', '_', 'g') AS head_snake
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q45_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
        |FROM events GROUP BY k ORDER BY k""".stripMargin,

    "q46_case_trycast" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS size_class,
        |  TRY_CAST(o_orderpriority AS BIGINT) AS prio_int,
        |  COALESCE(TRY_CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT), -1) AS prio_num
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q49_array_hofs" ->
      """SELECT vec_id,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |  len(list_filter(embedding, x -> x > 0.2)) > 0 AS has_big,
        |  len(list_distinct(list_transform(embedding,
        |      x -> CAST(x > 0 AS INT)))) AS n_sign_kinds,
        |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(embedding,
        |        x -> CASE WHEN x > 0 THEN CAST(x AS DOUBLE) ELSE 0.0 END)),
        |    (a, b) -> a + b), 6) AS sum_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q47_series" ->
      """SELECT n, n * n AS sq, n % 7 AS m7
        |FROM (SELECT CAST(g AS BIGINT) AS n FROM generate_series(1, 50) t(g))
        |ORDER BY n""".stripMargin
  )
}
