package graft.queries

import graft.operators.{AsOfJoin, Multimodal}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (DuckDB-native oracle), sketch aggregates, and the
  * multimodal feature pipeline (rows-only check — the decode stub is
  * engine-internal, see operators.Multimodal).
  */
object MiscQueries {

  val queries: Map[String, Q] = Map(
    // point-in-time join: each event gets the most recent prior signup
    // value of the same user (inclusive at equal timestamps)
    "q18_join_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dedupW = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      val right = ev.where(col("event_type") === "signup")
        .withColumn("_rn", row_number().over(dedupW))
        .where(col("_rn") === 1).drop("_rn")
      AsOfJoin.asof(
          ev.select(col("event_id"), col("user_id"), col("ts")),
          right, Seq("user_id"), "ts", Map("value" -> "signup_value"))
        .select(col("event_id"), col("user_id"), col("signup_value"))
        .orderBy(col("event_id"))
    }),

    // the same point-in-time join through the skew-salted variant: the
    // per-key sort splits into (user, day) window groups with carry-in
    // rows across buckets — same DuckDB ASOF oracle proves equivalence
    "q57_join_asof_salted" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dedupW = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      val right = ev.where(col("event_type") === "signup")
        .withColumn("_rn", row_number().over(dedupW))
        .where(col("_rn") === 1).drop("_rn")
      AsOfJoin.asofSalted(
          ev.select(col("event_id"), col("user_id"), col("ts")),
          right, Seq("user_id"), "ts", Map("value" -> "signup_value"))
        .select(col("event_id"), col("user_id"), col("signup_value"))
        .orderBy(col("event_id"))
    }),

    // forward as-of: each event gets the NEXT (earliest future,
    // inclusive) signup value of the same user — the "next scheduled
    // event" direction; same single-shuffle plan with the sort reversed
    "q58_join_asof_fwd" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dedupW = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      val right = ev.where(col("event_type") === "signup")
        .withColumn("_rn", row_number().over(dedupW))
        .where(col("_rn") === 1).drop("_rn")
      AsOfJoin.asof(
          ev.select(col("event_id"), col("user_id"), col("ts")),
          right, Seq("user_id"), "ts", Map("value" -> "signup_value"),
          forward = true)
        .select(col("event_id"), col("user_id"), col("signup_value"))
        .orderBy(col("event_id"))
    }),

    // sketch aggregates: approximate distinct + percentiles.
    // No DuckDB oracle — sketch algorithms differ per engine; the driver
    // records a rows-only check, and the exact twins are q02/q24.
    "q34_approx_sketch" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("p50_price"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000))
            .as("p99_price"))
        .orderBy(col("l_returnflag"))),

    // engine-storage round trip: events written through the engine's own
    // hour-partitioned sorted writer, read back via the catalog with a
    // time filter (exercises the TimePartitionPruning rule on engine
    // layout), aggregated — the oracle runs the same aggregation on the
    // ORIGINAL table, so the whole write/read path must be lossless
    "q90_engine_roundtrip" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val root = s"/tmp/graft_rt_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val cat = new graft.catalog.GraftCatalog(s, root)
      val marker = new java.io.File(s"$root/_done")
      // one week of events — enough hour partitions to exercise the
      // layout + pruning without dominating bench time
      if (!marker.exists()) {
        graft.ingest.HourPartitionedWriter.write(cat, "default", "events_rt",
          ev.where(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp"))
            .withColumnRenamed("ts", "time"))
        marker.getParentFile.mkdirs()
        marker.createNewFile()
      }
      cat.table("default", "events_rt")
        .where(col("time") >= lit("2024-01-03 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // multimodal pipeline over synthesized binary media (documents text
    // bytes): schema/batching/feature plumbing; rows-only check
    "q80_multimodal_features" -> ((s, dir) => {
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("bytes"), lit("txt").as("format"))
      Multimodal.extractFeatures(media)
        .select(col("media_id"), col("n_bytes"), col("width"), col("height"),
          col("checksum"))
        .orderBy(col("media_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q18_join_asof" ->
      """WITH r AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        |  WHERE event_type = 'signup'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
        |)
        |SELECT l.event_id, l.user_id, r.value AS signup_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) l
        |ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "q57_join_asof_salted" ->
      """WITH r AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        |  WHERE event_type = 'signup'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
        |)
        |SELECT l.event_id, l.user_id, r.value AS signup_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) l
        |ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "q58_join_asof_fwd" ->
      """WITH r AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        |  WHERE event_type = 'signup'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
        |)
        |SELECT l.event_id, l.user_id, r.value AS signup_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) l
        |ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "q90_engine_roundtrip" ->
      s"""SELECT event_type, COUNT(*) AS n, ${oSum("value")} AS sum_value,
         |  COUNT(DISTINCT user_id) AS n_users
         |FROM events
         |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-03 00:00:00'
         |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-08 00:00:00'
         |GROUP BY event_type ORDER BY event_type""".stripMargin
    // q34/q80: intentionally no oracle (sketches are engine-specific;
    // multimodal decode is stubbed) -> driver rows-only check
  )
}
