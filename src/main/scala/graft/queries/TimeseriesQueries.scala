package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over the `events` stream that the
  * time-series workload runs daily: gap-based sessionization and
  * gap-filling with last-observation-carried-forward — both pure
  * window/join compositions (no custom physical operator needed), both
  * oracle-checked.
  *
  * Scale shape: sessionization is one shuffle (partition by user) +
  * per-user sort — per-entity keys keep full parallelism (~1e6+ users);
  * gapfill's grid is (types × buckets), tiny relative to events, and the
  * fill is a per-type ordered window. Nothing quadratic, no driver loop.
  */
object TimeseriesQueries {

  private val SessionGapUs = 1800000000L // 30 min

  val queries: Map[String, Q] = Map(
    // sessionize: a session breaks after a 30-min silence; one row per
    // (user, session) with bounds and size
    "q26_sessionize" -> ((s, dir) => {
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
        .withColumn("new_s",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > SessionGapUs, 1).otherwise(0))
        .withColumn("session_no", sum(col("new_s")).over(wRun))
        .groupBy(col("user_id"), col("session_no"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("session_no"))
    }),

    // gapfill + LOCF: hourly per-type averages on a complete hour grid,
    // empty hours carrying the last observed value forward
    "q27_gapfill_locf" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), date_trunc("hour", col("ts")).as("bucket_ts"),
          col("value"))
      val hourly = ev.groupBy(col("event_type"), col("bucket_ts"))
        .agg(davg(col("value")).as("avg_v"))
      val bounds = ev.agg(min(col("bucket_ts")).as("mn"), max(col("bucket_ts")).as("mx"))
      val grid = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("bucket_ts"))
      val wFill = Window.partitionBy(col("event_type")).orderBy(col("bucket_ts"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("event_type", "bucket_ts"), "left")
        .withColumn("v_filled",
          round(last(col("avg_v"), ignoreNulls = true).over(wFill), 6))
        .select(col("event_type"), col("bucket_ts"), col("v_filled"))
        .orderBy(col("event_type"), col("bucket_ts"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q26_sessionize" ->
      s"""WITH d AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         |    epoch_us(CAST(ts AS TIMESTAMP)) -
         |      LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER
         |        (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us
         |  FROM events),
         |s AS (SELECT user_id, ts,
         |    CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > $SessionGapUs
         |                  THEN 1 ELSE 0 END) OVER
         |      (PARTITION BY user_id ORDER BY ts, event_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS session_no
         |  FROM d)
         |SELECT user_id, session_no, MIN(ts) AS session_start,
         |  MAX(ts) AS session_end, COUNT(*) AS n_events
         |FROM s GROUP BY user_id, session_no
         |ORDER BY user_id, session_no""".stripMargin,

    "q27_gapfill_locf" ->
      s"""WITH ev AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_ts,
         |    value FROM events),
         |hourly AS (SELECT event_type, bucket_ts, ${oAvg("value")} AS avg_v
         |  FROM ev GROUP BY event_type, bucket_ts),
         |bounds AS (SELECT MIN(bucket_ts) AS mn, MAX(bucket_ts) AS mx FROM ev),
         |grid AS (SELECT t.event_type, g.bucket_ts
         |  FROM (SELECT DISTINCT event_type FROM ev) t
         |  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
         |              AS bucket_ts FROM bounds) g)
         |SELECT event_type, bucket_ts,
         |  round(LAST_VALUE(avg_v IGNORE NULLS) OVER
         |    (PARTITION BY event_type ORDER BY bucket_ts
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_filled
         |FROM grid LEFT JOIN hourly USING (event_type, bucket_ts)
         |ORDER BY event_type, bucket_ts""".stripMargin
  )
}
