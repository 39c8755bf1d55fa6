package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed contracts for the composable stats_agg partials and
  * their derived statistics (Timescale toolkit stats_agg 1D+2D parity).
  */
class StatsAggSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val T0 = 1704240000L // 2024-01-03T00:00:00Z

  private def ts(offsetS: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(T0 + offsetS))

  private def conditions(rows: Seq[(Long, String, String, Double)]) = {
    import spark.implicits._
    rows.map { case (off, subj, of, v) =>
      (ts(off), subj, of, Option(v), Option.empty[String]) }
      .toDF("timestamp", "measurement_subject", "measurement_of",
        "measurement_number", "measurement_string")
  }

  test("statsAgg: exact integer partials for a hand-computed series") {
    // y = 2x + 1 (in units), x = 0, 60, 120 s → y = 1, 121, 241 units
    // (cents: 100, 12100, 24100)
    val out = TimeseriesQueries.statsAgg(
      conditions(Seq((0L, "s1", "m", 1.0), (60L, "s1", "m", 121.0),
        (120L, "s1", "m", 241.0))),
      "m", T0, T0 + 86400, widthS = 86400)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("sx") == 180L)
    assert(r.getAs[Long]("sy") == 100L + 12100L + 24100L)
    assert(r.getAs[Long]("sxx") == 60L * 60 + 120L * 120)
    assert(r.getAs[Long]("sxy") == 60L * 12100 + 120L * 24100)
  }

  test("statsDerive: perfectly linear series has corr 1 and the exact slope") {
    // y = 2x + 1 units = 200x + 100 cents → slope 200 cents/s, corr 1
    val derived = TimeseriesQueries.statsDerive(TimeseriesQueries.statsAgg(
      conditions(Seq((0L, "s1", "m", 1.0), (60L, "s1", "m", 121.0),
        (120L, "s1", "m", 241.0))),
      "m", T0, T0 + 86400, widthS = 86400)).collect().head
    assert(derived.getAs[Double]("slope") == 200.0)
    assert(derived.getAs[Double]("intercept") == 100.0)
    assert(derived.getAs[Double]("corr") == 1.0)
    assert(derived.getAs[Double]("avg_y") == (100.0 + 12100.0 + 24100.0) / 3)
  }

  test("statsDerive: n=1 and zero-variance groups yield NULL slope/corr") {
    val oneRow = TimeseriesQueries.statsDerive(TimeseriesQueries.statsAgg(
      conditions(Seq((0L, "s1", "m", 5.0))),
      "m", T0, T0 + 86400, widthS = 86400)).collect().head
    assert(oneRow.isNullAt(oneRow.fieldIndex("slope")))
    assert(oneRow.isNullAt(oneRow.fieldIndex("corr")))
    // two readings at the SAME timestamp: x-variance 0 → NULL slope, but
    // y stats still real
    val sameTs = TimeseriesQueries.statsDerive(TimeseriesQueries.statsAgg(
      conditions(Seq((0L, "s1", "m", 1.0), (0L, "s1", "m", 3.0))),
      "m", T0, T0 + 86400, widthS = 86400)).collect().head
    assert(sameTs.isNullAt(sameTs.fieldIndex("slope")))
    assert(sameTs.getAs[Double]("avg_y") == 200.0)
    assert(sameTs.getAs[Double]("var_y") == 10000.0) // ((100-200)²+(300-200)²)/2
  }

  test("additivity: merged day partials equal sums computed from the raw rows") {
    // two days of data; merge day partials by sum() and compare against
    // the partial definition evaluated directly over the quantized rows
    val rows = (0 until 48).map(h =>
      (h * 3600L, "s1", "m", math.sin(h / 3.0) * 10 + (h % 7)))
    val fine = TimeseriesQueries.statsAgg(conditions(rows), "m", T0,
      T0 + 172800, widthS = 86400)
    assert(fine.count() == 2)
    val merged = fine.groupBy("measurement_subject")
      .agg(sum("n").as("n"), sum("sx").as("sx"), sum("sy").as("sy"),
        sum("sxx").as("sxx"), sum("syy").as("syy"), sum("sxy").as("sxy"))
      .collect().head
    val xy = rows.map { case (off, _, _, v) =>
      (off, math.round(v * 100)) } // same half-up cent quantization
    assert(merged.getAs[Long]("n") == 48L)
    assert(merged.getAs[Long]("sx") == xy.map(_._1).sum)
    assert(merged.getAs[Long]("sy") == xy.map(_._2).sum)
    assert(merged.getAs[Long]("sxx") == xy.map(p => p._1 * p._1).sum)
    assert(merged.getAs[Long]("syy") == xy.map(p => p._2 * p._2).sum)
    assert(merged.getAs[Long]("sxy") == xy.map(p => p._1 * p._2).sum)
  }
}
