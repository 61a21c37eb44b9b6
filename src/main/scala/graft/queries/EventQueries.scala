package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semi-structured + event-time query surface over `events` (round-1
  * verdict items 5 and 9): JSON props extraction and event-time
  * windowing (tumbling + session). These are extension queries — they
  * deliberately stay OFF the census parity path, which must remain
  * processing-time-only (SURVEY T8).
  */
object EventQueries {

  private def events(s: SparkSession, d: String): DataFrame =
    graft.sources.Tables.table(s, d, "events")

  val all: Seq[QueryDef] = Seq(

    // ----- JSON extraction from the props column (from_json with an
    // explicit schema → typed struct, no schema inference at scale)
    QueryDef(
      "p_json_props",
      (s, d) => events(s, d)
        .withColumn("k",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
             round(avg("k"), 6).as("avg_k"),
             min("k").as("min_k"),
             max("k").as("max_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS cnt,
             |round(avg(k),6) AS avg_k, min(k) AS min_k, max(k) AS max_k FROM
             |(SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
             |GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // ----- tumbling event-time window (1 h): the batch shape of the
    // streaming window aggregation (stream.EventTimeWindows)
    QueryDef(
      "t_tumbling_window",
      (s, d) => events(s, d)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("cnt"), round(avg("value"), 6).as("avg_value"))
        .select(col("window.start").as("ws"), col("cnt"), col("avg_value"))
        .orderBy("ws"),
      Some("""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, count(*) AS cnt,
             |round(avg(value),6) AS avg_value
             |FROM events GROUP BY 1 ORDER BY ws""".stripMargin),
      bench = true),

    // ----- session window per user (6 h gap; session ends gap after
    // the last event). Oracle = classic gaps-and-islands SQL: a new
    // island starts when the inter-event gap is >= the session gap —
    // Spark sessions are half-open [ts, ts+gap), so an event landing
    // exactly at the previous end starts a NEW session.
    QueryDef(
      "t_session_window",
      (s, d) => events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("cnt"))
        .orderBy("user_id", "session_start"),
      Some("""SELECT user_id, session_start, session_end, cnt FROM
             |(SELECT user_id, min(ts) AS session_start,
             |        max(ts) + INTERVAL 6 HOUR AS session_end, count(*) AS cnt
             | FROM (SELECT user_id, ts,
             |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |                          ROWS UNBOUNDED PRECEDING) AS sid
             |       FROM (SELECT user_id, ts,
             |               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |                 OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |                    >= INTERVAL 6 HOUR
             |               THEN 1 ELSE 0 END AS new_s
             |             FROM events))
             | GROUP BY user_id, sid)
             |ORDER BY user_id, session_start""".stripMargin)),
  )
}
