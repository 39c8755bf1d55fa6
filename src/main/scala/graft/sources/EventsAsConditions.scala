package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maps the driver's synthetic `events` table onto the conditions EAV shape
  * so the nine dashboard queries (SURVEY §2B) run against shared test data.
  *
  * The mapping must stay expression-for-expression in sync with
  * [[oracleCte]] — the DuckDB oracle computes the identical view, so any
  * drift shows up as a correctness mismatch, not a silent skew.
  *
  *  - subject: `user_<user_id % 10>` — 10 series per metric
  *  - metric:  `event_type` — 5 metrics
  *  - number:  `value`
  *  - string:  a low/mid/high state band over `value` (gives MODE/change-
  *    point queries a string series with meaningful repeats)
  */
object EventsAsConditions {

  /** Read the events table. The driver writes `ts` as parquet
    * TIMESTAMP(NANOS), which Spark only reads via the nanosAsLong legacy
    * conf (as INT64 nanos) — convert to a µs TimestampType up front.
    * Integer `div` (not `/`, which round-trips through double and loses
    * sub-unit precision at 1e18) truncates exactly like DuckDB's
    * `epoch_us` on a ns timestamp, so both engines see identical µs.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  def load(spark: SparkSession, sfDir: String): DataFrame =
    loadEvents(spark, sfDir).select(
      col("ts").as("timestamp"),
      concat(lit("user_"), (col("user_id") % 10).cast("string")).as("measurement_subject"),
      lit("events").as("measurement_publisher"),
      col("event_type").as("measurement_of"),
      col("value").as("measurement_number"),
      when(col("value") < 5, "low").when(col("value") < 15, "mid").otherwise("high")
        .as("measurement_string"))

  /** The same view in DuckDB SQL (events = `<sfDir>/events.parquet`). */
  val oracleCte: String =
    """SELECT ts AS "timestamp",
      | 'user_' || CAST(user_id % 10 AS VARCHAR) AS measurement_subject,
      | 'events' AS measurement_publisher,
      | event_type AS measurement_of,
      | "value" AS measurement_number,
      | CASE WHEN "value" < 5 THEN 'low' WHEN "value" < 15 THEN 'mid' ELSE 'high' END AS measurement_string
      |FROM events""".stripMargin
}
