package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Event-table queries: time-windowed aggregation, semi-structured JSON
  * extraction, and batch sessionization. The same windowed-aggregation
  * semantics run incrementally in `graft.streaming.EventStreams`
  * (Structured Streaming + watermark); this batch form is the
  * oracle-checkable surface.
  *
  * Timestamps are formatted to second precision strings in outputs: the
  * source column is nanosecond-precision parquet, which Spark truncates
  * to microseconds — formatting removes the precision mismatch against
  * DuckDB.
  */
object EventQueries {

  /** Tumbling 1-hour window per event_type (Spark `window()` — the
    * streaming-capable group key; start == date_trunc for aligned
    * tumbling windows).
    */
  val q17HourlyWindow = Q(
    "q17_hourly_window",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
        .select(
          date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          $"event_type", $"n", $"total_value")
    },
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        event_type, count(*) AS n, round(sum(value),2) AS total_value
      FROM events GROUP BY 1, 2"""),
    headline = true)

  /** Semi-structured extraction: JSON path into the `props` payload
    * (the reference's nested-JSON handling, S2/G1 family — here scalar
    * extraction instead of array explode).
    */
  val q18JsonExtract = Q(
    "q18_json_extract",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_type", get_json_object($"props", "$.k").cast("int").as("k"))
        .groupBy($"event_type")
        .agg(
          round(avg($"k"), 4).as("avg_k"),
          max($"k").as("max_k"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT event_type,
        round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
        max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
        count(*) AS n
      FROM events GROUP BY event_type"""))

  /** Batch sessionization: 30-minute inactivity gap → session ids via
    * lag + running sum (W1 generalized to analytic windows; the
    * streaming counterpart uses flatMapGroupsWithState). Partition by
    * user — one shuffle, no driver loop, scales with user count.
    */
  val q19Sessionize = Q(
    "q19_sessionize",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      Tables.events(s, dir)
        .withColumn("prev_ts", lag($"ts", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_ts".isNull ||
            unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800L, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"session_id")
        .agg(
          count(lit(1)).as("n_events"),
          date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          round(sum($"value"), 2).as("session_value"))
    },
    Some("""WITH g AS (
        SELECT user_id, event_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR date_diff('second', lag(ts) OVER w, ts) > 1800
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      sess AS (
        SELECT user_id, ts, value,
          CAST(sum(new_session) OVER (
            PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM g)
      SELECT user_id, session_id, count(*) AS n_events,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        round(sum(value),2) AS session_value
      FROM sess GROUP BY user_id, session_id"""),
    headline = true)

  val all: Seq[Q] = Seq(q17HourlyWindow, q18JsonExtract, q19Sessionize)
}
