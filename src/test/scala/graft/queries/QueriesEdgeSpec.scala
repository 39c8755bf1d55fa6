package graft.queries

import graft.functions.{Asap, TimeWeight}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Edge inputs the dashboard layer must survive: mixed-type EAV metrics
  * (null measurement_number under a queried name), sub-bucket spans,
  * absent series.
  */
class QueriesEdgeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mixedConditions = {
    import spark.implicits._
    // metric "m" has numeric rows AND string-typed rows (null number) —
    // legal in the EAV model
    Seq(
      (ts(0), "s1", "m", Some(1.0), Some("low")),
      (ts(60), "s1", "m", None, Some("mid")),
      (ts(120), "s1", "m", Some(3.0), Some("mid")),
      (ts(180), "s1", "m", None, Some("high")),
      (ts(240), "s1", "m", Some(5.0), Some("high"))
    ).toDF("timestamp", "measurement_subject", "measurement_of",
      "measurement_number", "measurement_string")
  }

  private def ts(offsetS: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704240000L + offsetS))

  test("time-weighted average skips null numbers instead of crashing") {
    val out = TimeWeight.sampledDataWithTimeWeight(
      mixedConditions, "s1", "m", 1704240000L, 1704240300L,
      TimeWeight.Linear, resolution = 1).collect()
    assert(out.length == 1)
    // trapezoid over (0,1),(120,3),(240,5): integral = 120*2 + 120*4 = 720; /240 = 3
    assert(out.head.getDouble(1) == 3.0)
  }

  test("asap sampledData tolerates all-null buckets") {
    val out = Asap.sampledData(spark, mixedConditions, "s1", "m",
      1704240000L, 1704240300L, resolution = 5).collect()
    assert(out.nonEmpty)
  }

  test("mode query survives a sub-360-second span with >360 rows") {
    import spark.implicits._
    val dense = (0 until 400).map(i =>
      (ts(i / 2), "s1", "m", Option(i.toDouble), Some(if (i % 3 == 0) "a" else "b")))
      .toDF("timestamp", "measurement_subject", "measurement_of",
        "measurement_number", "measurement_string")
    val out = TimeseriesQueries.mostFrequentValueByInterval(
      dense, "s1", "m", 1704240000L, 1704240200L).collect()
    assert(out.nonEmpty)
    assert(out.forall(!_.isNullAt(0)), "null bucket means a zero interval slipped through")
  }

  test("asofJoin: latest right value at-or-before each left row, per key") {
    import spark.implicits._
    val left = Seq(("k1", ts(0), 10.0), ("k1", ts(100), 20.0), ("k1", ts(200), 30.0),
      ("k2", ts(50), 99.0))
      .toDF("k", "t", "lv")
    val right = Seq(("k1", ts(100), 1.5), ("k1", ts(150), 2.5), ("k2", ts(60), 9.9))
      .toDF("k", "t", "rv")
    val out = AsOfJoin.asofJoin(left, right, "k", "t", "lv", "rv")
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getDouble(2), Option(r.get(3))))
    assert(out.toSeq == Seq(
      ("k1", 10.0, None),        // no right row yet
      ("k1", 20.0, Some(1.5)),   // equal ts is visible (>=)
      ("k1", 30.0, Some(2.5)),   // latest at-or-before 200
      ("k2", 99.0, None)))       // k2's right row is later
  }

  test("asofJoin: NULL keys never match, but NULL-key left rows are kept (LEFT semantics)") {
    import spark.implicits._
    val left = Seq((Option("k1"), ts(100), 1.0), (Option.empty[String], ts(100), 2.0))
      .toDF("k", "t", "lv")
    val right = Seq((Option("k1"), ts(50), 5.0), (Option.empty[String], ts(50), 7.0))
      .toDF("k", "t", "rv")
    val out = AsOfJoin.asofJoin(left, right, "k", "t", "lv", "rv").collect()
      .map(r => (Option(r.getString(0)), r.getDouble(2), Option(r.get(3)))).toSet
    // SQL/DuckDB ASOF LEFT JOIN: NULL never equals NULL, yet the NULL-key
    // left row survives with no match
    assert(out == Set(
      (Some("k1"), 1.0, Some(5.0)),
      (None, 2.0, None)))
  }

  test("asofNext: earliest right row at-or-after each left row, per key") {
    import spark.implicits._
    val left = Seq(("k1", ts(100)), ("k1", ts(250)), ("k2", ts(10)))
      .toDF("k", "t")
    val right = Seq(("k1", ts(100)), ("k1", ts(180)), ("k1", ts(300)), ("k2", ts(5)))
      .toDF("k", "t")
    val out = AsOfJoin.asofNext(left, right, "k", "t")
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), Option(r.get(2)).map(_.toString)))
    assert(out.toSeq == Seq(
      ("k1", Some(ts(100).toString)),  // equal ts visible (>=)
      ("k1", Some(ts(300).toString)),  // earliest after 250 is 300, not 180
      ("k2", None)))                   // k2's only right row is earlier
  }

  test("aggregatedDataByDay fine branch uses PG's fractional width (900s grid) on a 1000s span") {
    import spark.implicits._
    // span 1000 is NOT divisible by 900: PG computes width =
    // span / (span/900.0) = exactly 900 s; the old integer formula
    // span / (span/900).toLong = 1000 s put everything before offset 1000
    // in one bucket
    val rows = Seq(0L, 450L, 899L, 900L, 950L, 1000L).zipWithIndex.map {
      case (off, i) => (ts(off), "s1", "m", Option(i.toDouble), Option("x"))
    }.toDF("timestamp", "measurement_subject", "measurement_of",
      "measurement_number", "measurement_string")
    val out = TimeseriesQueries.aggregatedDataByDay(
      rows, "s1", "m", 1704240000L, 1704241000L).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq(
      (1704240000L, (0.0 + 1.0 + 2.0) / 3), // offsets 0, 450, 899
      (1704240900L, (3.0 + 4.0 + 5.0) / 3)  // offsets 900, 950, 1000
    ))
  }

  test("aggregatedDataByDay rejects a zero span with a real message (PG raises too)") {
    val e = intercept[IllegalArgumentException] {
      TimeseriesQueries.aggregatedDataByDay(
        mixedConditions, "s1", "m", 1704240000L, 1704240000L)
    }
    assert(e.getMessage.contains("span must be positive"))
  }

  test("largestGaps: exact top-N consecutive gaps, heap plan not a global sort") {
    import spark.implicits._
    val d = Seq(
      (ts(0), "s1", "m"), (ts(100), "s1", "m"), (ts(700), "s1", "m"),   // gaps 100, 600
      (ts(0), "s2", "m"), (ts(400), "s2", "m"), (ts(500), "s2", "m"),   // gaps 400, 100
      (ts(999), "s3", "m")                                              // single event: no gap
    ).toDF("timestamp", "measurement_subject", "measurement_of")
    val q = graft.queries.TimeseriesQueries.largestGaps(
      d, "m", 1704240000L, 1704250000L, topN = 3)
    val got = q.collect().map(r =>
      (r.getString(0), r.getLong(3) / 1000000L)).toSeq
    // 600 > 400 > 100-tie broken by subject asc
    assert(got == Seq(("s1", 600L), ("s2", 400L), ("s1", 100L)))
    // global top-N must be a TakeOrderedAndProject, never a full sort
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("largestGaps: duplicate timestamps yield the same gap multiset as any tie order") {
    import spark.implicits._
    // two events at the same instant: whichever the lag window orders
    // first, the gap multiset is {0, 300} — the query's output is
    // tie-order independent even though lag's tie order isn't
    val d = Seq(
      (ts(0), "s1", "m"), (ts(0), "s1", "m"), (ts(300), "s1", "m")
    ).toDF("timestamp", "measurement_subject", "measurement_of")
    val got = graft.queries.TimeseriesQueries.largestGaps(
        d, "m", 1704240000L, 1704250000L, topN = 10)
      .collect().map(_.getLong(3) / 1000000L).sorted.toSeq
    assert(got == Seq(0L, 300L))
  }

  test("hampelOutliers: hand case — spike flagged, MAD=0 bucket silent, one exchange") {
    import spark.implicits._
    // bucket 1: values 1.00 2.00 3.00 4.00 100.00 -> med 3.00 (300c),
    // MAD = median(200,100,0,100,9700) = 100c; |9700| > 3*100 flags only
    // the spike. bucket 2 (next day): constant values -> MAD 0, silent
    // even though one row differs by a hair under the integer scale.
    val day = 86400L
    val d = (Seq(0L -> 1.0, 60L -> 2.0, 120L -> 3.0, 180L -> 4.0, 240L -> 100.0) ++
             Seq(day -> 5.0, day + 60 -> 5.0, day + 120 -> 5.0, day + 180 -> 5.004))
      .map { case (off, v) => (ts(off), "s1", "m", v) }
      .toDF("timestamp", "measurement_subject", "measurement_of", "measurement_number")
    val q = graft.queries.TimeseriesQueries.hampelOutliers(
      d, "m", 1704240000L, 1704240000L + 2 * day, widthS = day)
    val got = q.collect().map(r => (r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq((10000L, 300.0, 100.0)))
    // both window aggregates share one (subject, bucket) exchange
    // (AQE plan strings repeat the tree under "Initial Plan" — count the
    // final section only)
    val plan = q.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
  }

  test("hampelOutliers matches an in-memory median/MAD reference on random buckets") {
    import spark.implicits._
    import org.scalacheck.Gen
    // interpolated median over integers (quantile_cont semantics)
    def med(xs: Seq[Long]): Double = {
      val s = xs.map(_.toDouble).sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    def reference(vals: Seq[Long], k: Int): Set[Int] = {
      val m = med(vals)
      // deviations are integer halves (dyadic) — median them as doubles
      val devs = vals.map(v => math.abs(v - m)).sorted
      val n = devs.length
      val mad = if (n % 2 == 1) devs(n / 2) else (devs(n / 2 - 1) + devs(n / 2)) / 2.0
      vals.zipWithIndex.collect {
        case (v, i) if math.abs(v - m) > k * mad => i
      }.toSet
    }
    val gen = for {
      n <- Gen.choose(1, 30)
      vals <- Gen.listOfN(n, Gen.choose(-500L, 500L))
    } yield vals
    var checked = 0
    var draws = 0
    while (checked < 8 && draws < 60) {
      draws += 1
      gen.sample.foreach { vals =>
        val df = vals.zipWithIndex.map { case (c, i) =>
          (ts(i.toLong), "s1", "m", c.toDouble / 100.0)
        }.toDF("timestamp", "measurement_subject", "measurement_of", "measurement_number")
        val got = graft.queries.TimeseriesQueries.hampelOutliers(
            df, "m", 1704240000L, 1704250000L, widthS = 86400L)
          .collect().map(r => r.getLong(0)).toSet
        val expected = reference(vals, 3).map(i => (1704240000L + i) * 1000000L)
        assert(got == expected, s"vals=$vals got=$got expected=$expected")
        checked += 1
      }
    }
    assert(checked == 8)
  }

  test("hampelOutliers buckets pre-1970 timestamps by FLOOR division") {
    import spark.implicits._
    // 1969-12-31 ~23:53: truncating `div` would bucket these at 0; floor
    // semantics (matching DuckDB's `//`) puts them in the -86400 day
    val d = Seq(-400L -> 1.0, -340L -> 2.0, -280L -> 3.0, -220L -> 4.0, -160L -> 100.0)
      .map { case (off, v) =>
        (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(off)), "s1", "m", v) }
      .toDF("timestamp", "measurement_subject", "measurement_of", "measurement_number")
    val got = graft.queries.TimeseriesQueries.hampelOutliers(
        d, "m", -86400L, 86400L, widthS = 86400L)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((-86400L, 10000L)))
  }

  test("hampelOutliersApprox matches the discrete (lower-middle) median reference") {
    import spark.implicits._
    import org.scalacheck.Gen
    // at rank error < 1 (n ≤ accuracy) approx_percentile returns the
    // lower-middle element — rank ceil(n/2), DuckDB's quantile_disc
    def medDisc(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.length - 1) / 2)
    }
    def reference(vals: Seq[Long], k: Int): Map[Int, (Long, Long)] = {
      val m = medDisc(vals)
      val mad = medDisc(vals.map(v => math.abs(v - m)))
      vals.zipWithIndex.collect {
        case (v, i) if math.abs(v - m) > k * mad => i -> (m, mad)
      }.toMap
    }
    val gen = for {
      n <- Gen.choose(1, 40)
      vals <- Gen.listOfN(n, Gen.choose(-500L, 500L))
    } yield vals
    var checked = 0
    var draws = 0
    while (checked < 8 && draws < 60) {
      draws += 1
      gen.sample.foreach { vals =>
        val df = vals.zipWithIndex.map { case (c, i) =>
          (ts(i.toLong), "s1", "m", c.toDouble / 100.0)
        }.toDF("timestamp", "measurement_subject", "measurement_of", "measurement_number")
        val got = graft.queries.TimeseriesQueries.hampelOutliersApprox(
            df, "m", 1704240000L, 1704250000L, widthS = 86400L)
          .collect()
          .map(r => ((r.getLong(0) / 1000000L - 1704240000L).toInt, (r.getLong(4), r.getLong(5))))
          .toMap
        assert(got == reference(vals, 3), s"vals=$vals")
        checked += 1
      }
    }
    assert(checked == 8)
  }

  test("counterToRate: deltas, reset exclusion, duplicate-ts determinism") {
    import spark.implicits._
    // 10.00 -> 12.50 -> 3.00 (reset) -> 4.00
    val d = Seq(
      (ts(0), "s1", "m", 10.0), (ts(100), "s1", "m", 12.5),
      (ts(200), "s1", "m", 3.0), (ts(300), "s1", "m", 4.0),
      // s2: two readings at one instant — (ts, c) ordering pins pairing
      (ts(0), "s2", "m", 5.0), (ts(0), "s2", "m", 7.0), (ts(50), "s2", "m", 9.0)
    ).toDF("timestamp", "measurement_subject", "measurement_of", "measurement_number")
    val got = graft.queries.TimeseriesQueries.counterToRate(
        d, "m", 1704240000L, 1704250000L)
      .collect().map(r => (r.getString(2), r.getLong(3), r.getLong(4) / 1000000L, r.getBoolean(5)))
    assert(got.toSeq == Seq(
      ("s1", 250L, 100L, false),  // 12.50 - 10.00 = 250 cents
      ("s1", 0L, 100L, true),     // reset: delta excluded, flagged
      ("s1", 100L, 100L, false),  // 4.00 - 3.00 post-reset baseline
      ("s2", 200L, 0L, false),    // (0s,5.00) -> (0s,7.00): c-ordered tie
      ("s2", 200L, 50L, false)))  // (0s,7.00) -> (50s,9.00)
  }

  test("queries over an absent series return empty, not errors") {
    assert(TimeseriesQueries.aggregatedData(
      mixedConditions, "nope", "m", 1704240000L, 1704240300L, 10).collect().isEmpty)
    assert(TimeseriesQueries.filterUnchangedRows(
      mixedConditions, "nope", "m", 1704240000L, 1704240300L).collect().isEmpty)
    assert(Asap.sampledData(spark, mixedConditions, "nope", "m",
      1704240000L, 1704240300L, 5).collect().isEmpty)
  }

  test("ivf/lsh tiers are graceful on empty and absent inputs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(graft.operators.Ann.ivfTopK(empty, 0, 5).collect().isEmpty)
    assert(graft.operators.Ann.lshNeardupPairs(empty, 0.9).collect().isEmpty)
    val one = Seq((7L, Seq.fill(16)(1.0f))).toDF("vec_id", "embedding")
    assert(graft.operators.Ann.ivfTopK(one, 999, 5).collect().isEmpty)
    // dim inferred (16, not the old fixed 64)
    assert(graft.operators.Ann.lshNeardupPairs(one, 0.9).collect().isEmpty)
  }
}
