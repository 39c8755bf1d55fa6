package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed contracts for the Timescale-toolkit-shaped rollups:
  * OHLC bars, heartbeat uptime, and gap-filled bucket grids.
  */
class RollupsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val T0 = 1704240000L // 2024-01-03T00:00:00Z — midnight-aligned

  private def ts(offsetS: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(T0 + offsetS))

  private def conditions(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.map { case (off, subj, v) =>
      (ts(off), subj, "m", Option(v), Option.empty[String]) }
      .toDF("timestamp", "measurement_subject", "measurement_of",
        "measurement_number", "measurement_string")
  }

  test("ewmaSmooth: hand-computed dyadic taps with head normalization") {
    // cents: 10000, 20000, 40000
    // y1 = 10000/1; y2 = (20000 + 0.5·10000)/1.5 = 16666.666667
    // y3 = (40000 + 0.5·20000 + 0.25·10000)/1.75 = 30000
    val out = TimeseriesQueries.ewmaSmooth(
      conditions(Seq((0L, "s1", 100.0), (60L, "s1", 200.0), (120L, "s1", 400.0))),
      "m", T0, T0 + 3600)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((10000L, 10000.0), (20000L, 16666.666667),
      (40000L, 30000.0)), s"got ${out.toSeq}")
  }

  test("ewmaSmooth: constant series is a fixed point; taps window is trailing") {
    val out = TimeseriesQueries.ewmaSmooth(
      conditions((0L until 12L).map(i => (i * 60, "s1", 5.0))),
      "m", T0, T0 + 3600)
      .collect().map(_.getDouble(3))
    assert(out.forall(_ == 500.0), s"constant input must smooth to itself: ${out.toSeq}")
  }

  test("cusumDrift: closed form equals the sequential recurrence on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 300L).map(i => (i * 60, "s1", rnd.nextInt(1000) / 100.0))
    val (target, slack) = (400L, 50L)
    val got = TimeseriesQueries.cusumDrift(conditions(rows), "m", T0, T0 + 60 * 400,
        targetCents = target, slackCents = slack, threshCents = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // sequential reference: S = max(0, S + d)
    var s = 0L
    val expect = rows.sortBy(_._1).map { case (off, _, v) =>
      val c = math.round(v * 100)
      s = math.max(0L, s + c - target - slack)
      ((T0 + off) * 1000000L, s)
    }
    assert(got.toSeq == expect, s"closed form must equal the recurrence")
  }

  test("cusumDrift: persistent small shift alarms, isolated spike does not") {
    // target 500, slack 100: a single +30.00 spike contributes 2400 once
    // then decays at -100/reading (never reaches h=2500), while a
    // sustained +2.00 shift accumulates +100/reading for 30 readings
    // → S tops at 3000 > 2500 → alarm
    val spike = (0L until 40L).map(i =>
      (i * 60, "spiky", if (i == 20) 30.0 else 5.0))
    val drift = (0L until 40L).map(i =>
      (i * 60, "drifty", if (i >= 10) 7.0 else 5.0))
    val out = TimeseriesQueries.cusumDrift(conditions(spike ++ drift), "m",
        T0, T0 + 60 * 60, targetCents = 500, slackCents = 100, threshCents = 2500)
      .collect().groupBy(_.getString(1))
    assert(!out("spiky").exists(_.getBoolean(4)),
      "one spike must not trip the drift alarm")
    assert(out("drifty").exists(_.getBoolean(4)),
      "a sustained +2.00 shift must trip the alarm")
  }

  test("ohlcBars: open/high/low/close per bucket, deterministic duplicate-ts ties") {
    // bucket 0: values in time order 3.0, 9.0, 1.0, 4.0 → O=300 H=900 L=100 C=400
    // bucket 1: two readings at the SAME instant (2.0, 7.0):
    //   open picks the smaller value, close the larger (composite tie key)
    val out = TimeseriesQueries.ohlcBars(
      conditions(Seq(
        (0L, "s1", 3.0), (100L, "s1", 9.0), (200L, "s1", 1.0), (300L, "s1", 4.0),
        (3600L, "s1", 2.0), (3600L, "s1", 7.0))),
      "m", T0, T0 + 7200, widthS = 3600)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      ("s1", T0, 300L, 900L, 100L, 400L, 4L),
      ("s1", T0 + 3600, 200L, 700L, 200L, 700L, 2L)))
  }

  test("heartbeatUptime: liveness union, outage count, tail clip at range end") {
    // heartbeat 100s; events at 0, 50, 400; range [T0, T0+450]
    //   live: min(100,50)=50 + min(100,350)=100 + tail min(100,50)=50 → 200s
    //   one outage (gap 350 > 100)
    val out = TimeseriesQueries.heartbeatUptime(
      conditions(Seq((0L, "s1", 1.0), (50L, "s1", 1.0), (400L, "s1", 1.0))),
      "m", T0, T0 + 450, heartbeatS = 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("s1", 200000000L, 450000000L, 1L, 3L)))
  }

  test("gapfill LOCF: empty buckets carry the last observed average; leading stay null") {
    // hourly buckets over 5h; observations in buckets 1 (avg 2.0) and 3 (4.0)
    val out = TimeseriesQueries.gapfill(
      conditions(Seq((3600L, "s1", 2.0), (3 * 3600L, "s1", 4.0))),
      "m", T0, T0 + 5 * 3600, widthS = 3600, GapfillLocf)
      .collect().map(r => (r.getLong(1) - T0, Option(r.get(2)), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, None, 0L),                       // before first observation
      (3600L, Some(2.0), 1L),
      (7200L, Some(2.0), 0L),               // filled forward
      (10800L, Some(4.0), 1L),
      (14400L, Some(4.0), 0L)))             // trailing LOCF
  }

  test("gapfill linear: interior gaps interpolate in bucket time; edges stay null") {
    val out = TimeseriesQueries.gapfill(
      conditions(Seq((3600L, "s1", 2.0), (4 * 3600L, "s1", 8.0))),
      "m", T0, T0 + 6 * 3600, widthS = 3600, GapfillLinear)
      .collect().map(r => (r.getLong(1) - T0, Option(r.get(2)), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, None, 0L),                       // leading edge: no interpolation
      (3600L, Some(2.0), 1L),
      (7200L, Some(4.0), 0L),               // 1/3 of the way 2.0 → 8.0
      (10800L, Some(6.0), 0L),              // 2/3
      (14400L, Some(8.0), 1L),
      (18000L, None, 0L)))                  // trailing edge
  }

  test("empty inputs: every rollup returns empty, none crashes") {
    val empty = conditions(Seq.empty)
    assert(TimeseriesQueries.ohlcBars(empty, "m", T0, T0 + 3600, 3600).collect().isEmpty)
    assert(TimeseriesQueries.heartbeatUptime(empty, "m", T0, T0 + 3600, 60).collect().isEmpty)
    assert(TimeseriesQueries.gapfill(empty, "m", T0, T0 + 3600, 3600, GapfillLocf)
      .collect().isEmpty)
    assert(TimeseriesQueries.rollingStats(empty, "m", T0, T0 + 3600, 3).collect().isEmpty)
    assert(TimeseriesQueries.seasonalOutliers(empty, "m", T0, T0 + 3600,
      T0 + 3601, T0 + 7200).collect().isEmpty)
    assert(graft.functions.Lttb.downsample(empty, "m", T0, T0 + 3600, 5)
      .collect().isEmpty)
    assert(EventAnalytics.retentionCohorts(empty, "m", T0, T0 + 3600).collect().isEmpty)
    assert(EventAnalytics.pivotWide(empty, Seq("m"), T0, T0 + 3600, 3600)
      .collect().isEmpty)
  }

  test("gapfill: grid is per observed subject — absent subjects add no rows") {
    val out = TimeseriesQueries.gapfill(
      conditions(Seq((0L, "s1", 1.0), (3600L, "s2", 2.0))),
      "m", T0, T0 + 2 * 3600, widthS = 3600, GapfillLocf)
      .collect()
    assert(out.length == 4) // 2 subjects × 2 buckets
  }

  private def states(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (off, subj, st) =>
      (ts(off), subj, "m", Option.empty[Double], Option(st)) }
      .toDF("timestamp", "measurement_subject", "measurement_of",
        "measurement_number", "measurement_string")
  }

  test("stateDurations: LOCF hold times, run counts, tail clipped at range end") {
    // s1: on@0 → off@100 → on@250 → on@300, range end 500
    //   on:  (100-0) + (300-250) + tail (500-300) = 350s over 2 runs
    //   off: (250-100) = 150s over 1 run
    val out = TimeseriesQueries.stateDurations(
      states(Seq((0L, "s1", "on"), (100L, "s1", "off"),
        (250L, "s1", "on"), (300L, "s1", "on"))),
      "m", T0, T0 + 500)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("s1", "off", 150000000L, 1L, 1L),
      ("s1", "on", 350000000L, 2L, 3L)))
  }

  test("stateDurations: duplicate-timestamp readings order by state, zero-length intervals") {
    // two readings at the same instant: (ts, state) order puts "a" before
    // "b" — "a" holds 0 µs, "b" holds to range end; still 1 run each
    val out = TimeseriesQueries.stateDurations(
      states(Seq((0L, "s1", "b"), (0L, "s1", "a"))),
      "m", T0, T0 + 100)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("a", 0L, 1L), ("b", 100000000L, 1L)))
  }

  test("counterAgg: hand-computed reset-adjusted delta, resets, rate") {
    // cents 10000 → 30000 (+20000) → 20000 (reset: +20000, the new reading
    // itself) → 50000 (+30000) ⇒ delta 70000, 1 reset,
    // rate = 700.00 / 180 s = 3.888889
    val out = TimeseriesQueries.counterAgg(
      conditions(Seq((0L, "s1", 100.0), (60L, "s1", 300.0),
        (120L, "s1", 200.0), (180L, "s1", 500.0))),
      "m", T0, T0 + 3600, bucketS = 21600)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(7)))
    assert(out.toSeq == Seq((70000L, 1L, 4L, 3.888889)), s"got ${out.toSeq}")
  }

  test("counterAgg: resets across a bucket edge do not count (within-bucket pairs only)") {
    val out = TimeseriesQueries.counterAgg(
      conditions(Seq((0L, "s1", 500.0), (3700L, "s1", 100.0), (3800L, "s1", 300.0))),
      "m", T0, T0 + 7200, bucketS = 3600)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // bucket A: lone point, delta 0, no reset; bucket B: +20000, no reset —
    // the 500→100 drop across the edge is invisible to both buckets
    assert(out.toSeq == Seq((T0, 0L, 0L), (T0 + 3600, 20000L, 0L)), s"got ${out.toSeq}")
  }

  test("counterRollup: bridge-merged partials equal computing the coarse level directly") {
    // a reset that crosses a FINE bucket edge is invisible at the fine
    // level but must reappear through the ⊕ bridge at the coarse level
    val handRows = Seq((0L, "s1", 500.0), (3700L, "s1", 100.0), (3800L, "s1", 300.0))
    val rnd = new scala.util.Random(11)
    val fuzzRows = (0L until 400L).flatMap(i => Seq(
      (i * 97, "s2", rnd.nextInt(2000) / 100.0),
      (i * 97, "s2", rnd.nextInt(2000) / 100.0), // duplicate-ts ties
      (i * 131, "s3", rnd.nextInt(2000) / 100.0)))
    val cond = conditions(handRows ++ fuzzRows)
    val direct = TimeseriesQueries.counterAgg(cond, "m", T0, T0 + 60000, bucketS = 10800)
      .collect().toSeq
    val rolled = TimeseriesQueries.counterRollup(
        TimeseriesQueries.counterPartials(cond, "m", T0, T0 + 60000, widthS = 3600),
        coarseS = 10800)
      .collect().toSeq
    assert(rolled.map(_.toSeq) == direct.map(_.toSeq),
      s"rollup must equal direct: ${rolled.take(3)} vs ${direct.take(3)}")
    // and the hand case specifically: one coarse bucket, reset recovered
    val hand = rolled.filter(_.getString(0) == "s1")
    assert(hand.map(r => (r.getLong(2), r.getLong(3), r.getLong(4))) ==
      Seq((30000L, 1L, 3L)), s"got ${hand.toSeq}")
  }

  test("m4Downsample: keeps exactly the min/max time and min/max value rows") {
    val vals = Seq(5.0, 3.0, 9.0, 4.0, 1.0, 6.0, 5.0)
    val out = TimeseriesQueries.m4Downsample(
      conditions(vals.zipWithIndex.map { case (v, i) => (i * 60L, "s1", v) }),
      "m", T0, T0 + 3600, bucketS = 21600)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    // first (t=0), max value (t=120), min value (t=240), last (t=360)
    assert(out.toSeq == Seq(
      (T0 * 1000000L, 500L),
      ((T0 + 120) * 1000000L, 900L),
      ((T0 + 240) * 1000000L, 100L),
      ((T0 + 360) * 1000000L, 500L)), s"got ${out.toSeq}")
  }

  test("interpolatedCounterRate: proportional edge credit, hand-computed") {
    // counter 1.00@1800 → 5.00@5400 crosses the 3600 edge at slope
    // 400c/3600s: bucket 0 gets the in-[1800,3600) half = 200c,
    // bucket 1 the [3600,5400) half = 200c; rate = delta / 3600 s
    val out = TimeseriesQueries.interpolatedCounterRate(
      conditions(Seq((1800L, "s1", 1.0), (5400L, "s1", 5.0))),
      "m", T0, T0 + 7200, bucketS = 3600)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (T0, 2.0, round6(2.0 / 3600)),
      (T0 + 3600, 2.0, round6(2.0 / 3600))), s"got ${out.toSeq}")
  }

  test("interpolatedCounterRate: adjacent-bucket deltas conserve the total; resets credited to the later bucket") {
    val rnd = new scala.util.Random(3)
    val rows = (0L until 300L).map(i => (i * 120, "s1", rnd.nextInt(3000) / 100.0))
    val cond = conditions(rows)
    val interp = TimeseriesQueries.interpolatedCounterRate(cond, "m", T0, T0 + 36000,
        bucketS = 3600)
      .collect().map(r => (r.getDouble(2), r.getLong(4)))
    // every pair is 120 s apart < bucket width, so no interior bucket is
    // ever skipped: interpolated deltas sum to the whole-range delta
    val whole = TimeseriesQueries.counterAgg(cond, "m", T0, T0 + 36000,
        bucketS = 86400 * 7)
      .collect()(0).getLong(2)
    val sumInterp = interp.map(_._1).sum
    assert(math.abs(sumInterp - whole / 100.0) < 1e-3,
      s"interpolated deltas must conserve the total: $sumInterp vs ${whole / 100.0}")
    // reset count matches the pair-level count
    val pairResets = TimeseriesQueries.counterToRate(cond, "m", T0, T0 + 36000)
      .filter(org.apache.spark.sql.functions.col("reset")).count()
    assert(interp.map(_._2).sum == pairResets)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("histogramAgg: hand-computed bins with under/overflow clamping") {
    // [0, 10) in 5 bins of 2.00: values -1 (clamps to bin 0), 0.5 (bin 0),
    // 3.0 (bin 1), 9.99 (bin 4), 25 (clamps to bin 4)
    val out = TimeseriesQueries.histogramAgg(
      conditions(Seq((0L, "s1", -1.0), (60L, "s1", 0.5), (120L, "s1", 3.0),
        (180L, "s1", 9.99), (240L, "s1", 25.0))),
      "m", T0, T0 + 3600, bucketS = 21600, lo = 0.0, hi = 10.0, nbins = 5)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 2L), (1L, 1L), (4L, 2L)), s"got ${out.toSeq}")
  }

  test("saxSymbols: hand-computed letters at the Gaussian breakpoints; zero variance -> null") {
    // one point per hourly bucket, values 1..8: mean 4.5, population std
    // ~2.2913 → z = ±1.53, ±1.09, ±0.65, ±0.22 → letters a a b b c c d d
    val rows = (0 until 8).map(i => (i * 3600L, "s1", (i + 1).toDouble)) ++
      (0 until 4).map(i => (i * 3600L, "flat", 5.0))
    val out = TimeseriesQueries.saxSymbols(conditions(rows), "m", T0, T0 + 30000,
        bucketS = 3600)
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(4)) null else r.getString(4)))
    val s1 = out.filter(_._1 == "s1").sortBy(_._2).map(_._3)
    assert(s1.toSeq == Seq("a", "a", "b", "b", "c", "c", "d", "d"), s"got ${s1.toSeq}")
    assert(out.filter(_._1 == "flat").forall(_._3 == null),
      "zero-variance series must have null symbols")
  }

  test("interpolatedTimeWeight: cross-edge LOCF head and tail, hand-computed") {
    // bucket width 3600, points 2.00@1800 and 4.00@5400, range end T0+7200:
    //  - bucket T0:     [1800, 3600) at 2.00            → avg 2.0, 1800 s
    //  - bucket T0+3600: [3600, 5400) at 2.00 (carried) +
    //                    [5400, 7200) at 4.00 (held)    → avg 3.0, 3600 s
    val out = TimeseriesQueries.interpolatedTimeWeight(
      conditions(Seq((1800L, "s1", 2.0), (5400L, "s1", 4.0))),
      "m", T0, T0 + 7200, bucketS = 3600)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq((T0, 2.0, 1800000000L), (T0 + 3600, 3.0, 3600000000L)),
      s"got ${out.toSeq}")
  }

  test("interpolatedTimeWeight: a carried value skips empty interior buckets without double-counting") {
    // points 2.00@1800 (bucket 0) and 4.00@9000 (bucket 2), end T0+10800:
    // bucket 1 has no readings → not emitted; bucket 2's head carries 2.00
    // from two buckets back over [7200, 9000)
    val out = TimeseriesQueries.interpolatedTimeWeight(
      conditions(Seq((1800L, "s1", 2.0), (9000L, "s1", 4.0))),
      "m", T0, T0 + 10800, bucketS = 3600)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq((T0, 2.0, 1800000000L), (T0 + 7200, 3.0, 3600000000L)),
      s"got ${out.toSeq}")
  }

  test("interpolatedTimeWeight: tail capped at the query range end") {
    // single point 3.00@600, end T0+1000 (mid-bucket): coverage [600, 1000)
    val out = TimeseriesQueries.interpolatedTimeWeight(
      conditions(Seq((600L, "s1", 3.0))),
      "m", T0, T0 + 1000, bucketS = 3600)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq((T0, 3.0, 400000000L)), s"got ${out.toSeq}")
  }
}
