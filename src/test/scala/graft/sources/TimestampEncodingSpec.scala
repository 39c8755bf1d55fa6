package graft.sources

import java.nio.file.Files

import graft.ConditionsView
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Regression spec for the driver's testdata re-encodings of `events.ts`.
  *
  * The driver has shipped the column as parquet TIMESTAMP(NANOS) (Spark:
  * LongType under nanosAsLong) and as TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (Spark: TIMESTAMP_NTZ). `EventsAsConditions
  * .normalizeTs` must map every Spark-visible shape — raw long ns, NTZ µs,
  * UTC µs — to the same TimestampType instants so every downstream
  * `unix_micros` keeps working whatever the next regeneration picks.
  */
class TimestampEncodingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 2024-01-03T00:00:00Z and ten 90-second steps: µs instants.
  private val baseUs = 1704240000000000L
  private val instantsUs = (0 until 10).map(i => baseUs + i * 90000000L)

  private def writeAndLoad(encode: Long => org.apache.spark.sql.Column,
                           tsType: DataType): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val dir = Files.createTempDirectory("ts-enc").toString
    val df = instantsUs.zipWithIndex.toDF("us", "user_id")
      .withColumn("ts", encode(0L))
      .withColumn("event_type", lit("click"))
      .withColumn("value", col("user_id").cast(DoubleType))
      .select("ts", "user_id", "event_type", "value")
    assert(df.schema("ts").dataType == tsType, s"fixture wrote ${df.schema("ts").dataType}, wanted $tsType")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    EventsAsConditions.loadEvents(spark, dir)
  }

  private def assertNormalized(loaded: org.apache.spark.sql.DataFrame): Unit = {
    assert(loaded.schema("ts").dataType == TimestampType)
    val got = loaded.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == instantsUs, "instants drifted through normalization")
  }

  test("raw INT64 nanos (legacy TIMESTAMP(NANOS) read shape) normalizes") {
    assertNormalized(writeAndLoad(_ => expr("us * 1000"), LongType))
  }

  test("TIMESTAMP_NTZ micros (current driver encoding) normalizes") {
    assertNormalized(writeAndLoad(_ => timestamp_micros(col("us")).cast(TimestampNTZType), TimestampNTZType))
  }

  test("UTC-adjusted TIMESTAMP micros passes through") {
    assertNormalized(writeAndLoad(_ => timestamp_micros(col("us")), TimestampType))
  }

  test("dashboard queries run end-to-end over an NTZ-encoded events table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ts-enc-e2e").toString
    val n = 2000
    val df = spark.range(n.toLong).select(
      timestamp_micros(lit(baseUs) + col("id") * 90000000L).cast(TimestampNTZType).as("ts"),
      (col("id") % 40).cast(LongType).as("user_id"),
      element_at(array(lit("click"), lit("view"), lit("purchase")), (col("id") % 3).cast(IntegerType) + 1).as("event_type"),
      (col("id") % 25).cast(DoubleType).as("value"))
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val v = new ConditionsView(EventsAsConditions.load(spark, dir))
    val s = baseUs / 1000000L
    val e = s + n.toLong * 90L + 1
    assert(v.getAggregatedData("user_3", "click", s, e, 50).count() > 0)
    assert(v.getMostFrequentValueByTimeInterval("user_3", "click", s, e).count() > 0)
    assert(v.formatTimeIntervals("user_3", "click", s, e, clockS = e).count() > 0)
    assert(v.filterUnchangedRows("user_3", "click", s, e).count() > 0)
  }

  test("the NANOS fallback fires on WRAPPED schema-inference errors too") {
    // Spark wraps analysis errors, so the loader walks the cause chain
    // instead of substring-matching only the top-level message
    val nanos = new RuntimeException("Illegal Parquet type: INT64 (TIMESTAMP(NANOS,false))")
    assert(EventsAsConditions.mentionsNanos(nanos))
    assert(EventsAsConditions.mentionsNanos(
      new RuntimeException("job aborted", new RuntimeException("task failed", nanos))))
    assert(!EventsAsConditions.mentionsNanos(
      new RuntimeException("job aborted", new RuntimeException(null: String))))
    // self-referential cause chains must not loop forever
    val loopy = new RuntimeException("a")
    val loopy2 = new RuntimeException("b", loopy)
    loopy.initCause(loopy2)
    assert(!EventsAsConditions.mentionsNanos(loopy))
  }
}
