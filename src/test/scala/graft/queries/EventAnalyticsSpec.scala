package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed contracts for rolling stats, seasonal-baseline
  * outliers, retention cohorts, and the EAV-to-wide pivot.
  */
class EventAnalyticsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val T0 = 1704240000L // 2024-01-03T00:00:00Z (midnight UTC)

  private def ts(offsetS: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(T0 + offsetS))

  private def conditions(rows: Seq[(Long, String, String, Double)]) = {
    import spark.implicits._
    rows.map { case (off, subj, of, v) =>
      (ts(off), subj, of, Option(v), Option.empty[String]) }
      .toDF("timestamp", "measurement_subject", "measurement_of",
        "measurement_number", "measurement_string")
  }

  test("rollingStats: trailing k-window count/sum/min/max") {
    val out = TimeseriesQueries.rollingStats(
      conditions(Seq((0L, "s1", "m", 1.0), (60L, "s1", "m", 3.0),
        (120L, "s1", "m", 2.0), (180L, "s1", "m", 5.0))),
      "m", T0, T0 + 300, k = 2)
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, 100L, 100L, 100L),
      (2L, 400L, 100L, 300L),
      (2L, 500L, 200L, 300L),
      (2L, 700L, 200L, 500L)))
  }

  test("seasonalOutliers: flags deviation from the hour-of-day profile only") {
    // baseline day 1: hour 0 always 10.0, hour 12 always 50.0
    val base = (0 until 3).flatMap(d => Seq(
      (d * 86400L, "s1", "m", 10.0),
      (d * 86400L + 12 * 3600, "s1", "m", 50.0)))
    // eval day 5: 50.0 at hour 0 (a spike THERE) and 50.0 at hour 12 (normal)
    val eval_ = Seq((5 * 86400L, "s1", "m", 50.0),
      (5 * 86400L + 12 * 3600, "s1", "m", 50.0))
    val out = TimeseriesQueries.seasonalOutliers(
      conditions(base ++ eval_), "m",
      baseStartS = T0, baseEndS = T0 + 3 * 86400,
      evalStartS = T0 + 4 * 86400, evalEndS = T0 + 6 * 86400)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 5000L))) // hour 0 flagged, hour 12 not
  }

  test("funnel: per-hop horizon restart, shared anchors, dropouts") {
    // s1: click@0 → view@100 (≤1h) → purchase@3700 (3600 after view ✓)
    //     click@50 → same view@100 → same purchase chain   (shared anchor)
    //     click@9000 → view@20000 (>1h gap: dropout at hop 1)
    // s2: click@0 → view@3600 (exactly 1h ✓) → no purchase
    val rows = Seq(
      (0L, "s1", "click", 1.0), (50L, "s1", "click", 1.0),
      (100L, "s1", "view", 1.0), (3700L, "s1", "purchase", 1.0),
      (9000L, "s1", "click", 1.0), (20000L, "s1", "view", 1.0),
      (0L, "s2", "click", 1.0), (3600L, "s2", "view", 1.0))
    val out = EventAnalytics.funnel(conditions(rows),
        Seq("click", "view", "purchase"), T0, T0 + 86400, horizonS = 3600)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("s1") == ((3L, 2L, 2L))) // 3 clicks, 2 reach view, 2 reach purchase
    assert(out("s2") == ((1L, 1L, 0L))) // 1 click, view at exactly 1h counts, no purchase
  }

  test("retentionCohorts: first-day cohorts with per-offset distinct counts") {
    // u1 active days 0,1,3; u2 active days 0,3; u3 joins day 1, active 1,2
    val rows = Seq(
      (0L, "u1"), (86400L, "u1"), (3 * 86400L, "u1"),
      (3600L, "u2"), (3 * 86400L + 60, "u2"),
      (86400L + 7200, "u3"), (2 * 86400L, "u3")
    ).map { case (off, u) => (off, u, "m", 1.0) }
    val day0 = T0 / 86400 // cohort day in absolute UTC days
    val out = EventAnalytics.retentionCohorts(
      conditions(rows), "m", T0, T0 + 5 * 86400)
      .collect().map(r => (r.getLong(0) - day0, r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L),  // u1+u2 on their day 0
      (0L, 1L, 1L),  // u1
      (0L, 3L, 2L),  // u1+u2
      (1L, 0L, 1L),  // u3's cohort
      (1L, 1L, 1L))) // u3 next day
  }

  test("pivotWide: one column per metric, NULL where absent, explicit schema") {
    val out = EventAnalytics.pivotWide(
      conditions(Seq(
        (0L, "s1", "click", 2.0), (60L, "s1", "click", 4.0),
        (120L, "s1", "view", 7.0),
        (86400L, "s1", "view", 9.0),
        (0L, "s1", "other", 99.0))), // not in the metric list → excluded
      Seq("click", "view"), T0, T0 + 2 * 86400, widthS = 86400)
    assert(out.columns.toSeq ==
      Seq("measurement_subject", "bucket_s", "click", "view"))
    val rows = out.collect().map(r =>
      (r.getLong(1), Option(r.get(2)), Option(r.get(3))))
    assert(rows.toSeq == Seq(
      (T0, Some(3.0), Some(7.0)),
      (T0 + 86400, None, Some(9.0))))
  }
}
