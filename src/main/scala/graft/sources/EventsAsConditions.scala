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

  /** Read the events table, normalizing `ts` to µs TimestampType whatever
    * the parquet physical encoding. The driver has shipped two encodings so
    * far — TIMESTAMP(NANOS) (readable only as INT64 nanos under the
    * nanosAsLong legacy conf) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (read as TIMESTAMP_NTZ) — so accept every plausible shape:
    *
    *  - LongType       : ns epoch; integer `div 1000` (not `/`, which
    *    round-trips through double and loses sub-µs precision at 1e18)
    *    truncates exactly like DuckDB's `epoch_us`, so both engines agree.
    *  - TimestampNTZType: cast to TimestampType. All entry points pin
    *    spark.sql.session.timeZone=UTC, so the cast is instant-preserving
    *    and matches DuckDB's UTC reading of the same file.
    *  - TimestampType  : UTC-adjusted µs — pass through.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    // TIMESTAMP(NANOS) has no Spark type; the session-wide legacy flag is
    // the only switch, and it must REMAIN set through execution of the
    // returned (lazy) frame — executors re-convert the footer schema — so
    // it cannot be save/restored around the read. Set it only when this
    // file actually needs it, instead of unconditionally mutating every
    // caller's session.
    val df = try spark.read.parquet(path) catch {
      case e: Exception if mentionsNanos(e) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
    }
    normalizeTs(df, "ts")
  }

  /** Whether a schema-inference failure is the TIMESTAMP(NANOS) one —
    * checked over the WHOLE cause chain, not just the top message:
    * Spark wraps analysis errors (SparkException over AnalysisException
    * over the parquet converter's message), and a wrapped NANOS error
    * that went unrecognized would fail the load that the retry-with-
    * `nanosAsLong` handles. Cycle-guarded (`getCause` chains can loop).
    */
  private[sources] def mentionsNanos(t: Throwable): Boolean = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Throwable, java.lang.Boolean]())
    var cur = t
    while (cur != null && seen.add(cur)) {
      if (String.valueOf(cur.getMessage).contains("NANOS")) return true
      cur = cur.getCause
    }
    false
  }

  /** Normalize a parquet timestamp column of any physical shape
    * (ns-as-long / NTZ-µs / UTC-µs) to TimestampType. See [[loadEvents]].
    */
  def normalizeTs(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"events.$colName: unsupported timestamp encoding $other")
    }
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
