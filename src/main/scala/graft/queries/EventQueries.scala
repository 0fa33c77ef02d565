package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time batch analytics over the `events` table — the batch twin of
  * the streaming windowed verdicts (same hour buckets, no watermark).
  * Hour ids are epoch-derived integers so Spark (UTC session) and DuckDB
  * agree exactly with no timestamp-type coupling.
  */
object EventQueries {

  private def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  /** Hourly per-type counts + value extrema (floats avoided in favour of
    * exact aggregations; value min/max are order-independent). */
  def hourly(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .withColumn("hour_id",
        floor(unix_timestamp(col("ts").cast("timestamp")) / 3600).cast("long"))
      .groupBy("hour_id", "event_type")
      .agg(
        count(lit(1)).as("n"),
        round(min(col("value")), 2).as("min_v"),
        round(max(col("value")), 2).as("max_v"))

  /** Per-user event sessions: a new session starts after a gap > 30 min
    * (lag window); emits per-user session counts — the sessionization
    * shape over event time. */
  def sessions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    events(spark, sfDir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts").cast("timestamp")) -
            unix_timestamp(col("prev_ts").cast("timestamp")) > 1800, 1).otherwise(0))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("new_session")).cast("long").as("n_sessions"))
  }

  val oracles: Map[String, String] = Map(
    "ev_hourly" ->
      """SELECT cast(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id, event_type,
        |  count(*) AS n,
        |  round(min(value), 2) AS min_v, round(max(value), 2) AS max_v
        |FROM events GROUP BY 1, 2""".stripMargin,
    "ev_sessions" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |)
        |SELECT user_id, count(*) AS n_events,
        |  cast(sum(new_session) AS BIGINT) AS n_sessions
        |FROM g GROUP BY user_id""".stripMargin
  )
}
