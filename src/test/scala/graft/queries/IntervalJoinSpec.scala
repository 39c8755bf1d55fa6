package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Binned interval join: equality with the naive range join on random
  * (overlapping) interval sets across bin widths, plus the plan
  * guarantee that motivates it — no nested-loop join.
  */
class IntervalJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def naive(points: Seq[Long], ivs: Seq[(Long, Long, Int)]): Set[(Long, Int)] =
    (for {
      p <- points
      (s, e, id) <- ivs
      if p >= s && p < e
    } yield (p, id)).toSet

  private def binned(points: Seq[Long], ivs: Seq[(Long, Long, Int)], w: Long): Set[(Long, Int)] =
    IntervalJoin.pointInInterval(
        points.toDF("ts"), ivs.toDF("s", "e", "iv_id"), "ts", "s", "e", w)
      .select("ts", "iv_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  test("matches the naive range join on random overlapping intervals, several bin widths") {
    val gen = for {
      nIv <- Gen.choose(1, 15)
      ivs <- Gen.listOfN(nIv, for {
        s <- Gen.choose(0L, 1000L)
        len <- Gen.choose(-10L, 300L) // negative ⇒ empty interval case
      } yield (s, s + len))
      nPt <- Gen.choose(1, 60)
      pts <- Gen.listOfN(nPt, Gen.choose(0L, 1300L))
    } yield (ivs, pts)
    var checked = 0
    var draws = 0
    while (checked < 8 && draws < 80) {
      draws += 1
      gen.sample.foreach { case (ivs0, pts) =>
        val ivs = ivs0.zipWithIndex.map { case ((s, e), i) => (s, e, i) }
        val expected = naive(pts, ivs)
        for (w <- Seq(1L, 7L, 64L, 1000L))
          assert(binned(pts, ivs, w) == expected, s"w=$w ivs=$ivs pts=$pts")
        checked += 1
      }
    }
    assert(checked == 8)
  }

  test("pre-1970 (negative) timestamps: floor binning keeps boundary matches") {
    // straddles zero and sits entirely negative; w=7 does not divide the
    // endpoints, so truncating div would misplace the negative bins
    val ivs = Seq((-10L, 0L, 1), (-21L, -7L, 2), (-5L, 9L, 3))
    val pts = Seq(-21L, -10L, -8L, -7L, -5L, -1L, 0L, 8L)
    assert(binned(pts, ivs, 7L) == naive(pts, ivs))
    assert(binned(pts, ivs, 7L).contains((-1L, 1)))  // boundary-adjacent match survives
    assert(!binned(pts, ivs, 7L).contains((0L, 1)))  // end stays exclusive at 0
  }

  test("matches the naive range join on random intervals over a NEGATIVE time domain") {
    val gen = for {
      nIv <- Gen.choose(1, 12)
      ivs <- Gen.listOfN(nIv, for {
        s <- Gen.choose(-1000L, 200L)
        len <- Gen.choose(-10L, 300L)
      } yield (s, s + len))
      nPt <- Gen.choose(1, 50)
      pts <- Gen.listOfN(nPt, Gen.choose(-1200L, 400L))
    } yield (ivs, pts)
    var checked = 0
    var draws = 0
    while (checked < 6 && draws < 60) {
      draws += 1
      gen.sample.foreach { case (ivs0, pts) =>
        val ivs = ivs0.zipWithIndex.map { case ((s, e), i) => (s, e, i) }
        val expected = naive(pts, ivs)
        for (w <- Seq(1L, 7L, 64L))
          assert(binned(pts, ivs, w) == expected, s"w=$w ivs=$ivs pts=$pts")
        checked += 1
      }
    }
    assert(checked == 6)
  }

  test("overlapping intervals: a point matches every containing interval exactly once") {
    val ivs = Seq((0L, 100L, 1), (50L, 150L, 2), (50L, 150L, 3))
    val got = binned(Seq(75L), ivs, 10L)
    assert(got == Set((75L, 1), (75L, 2), (75L, 3)))
  }

  test("half-open semantics: start inclusive, end exclusive; empty interval matches nothing") {
    val ivs = Seq((10L, 20L, 1), (30L, 30L, 2), (40L, 35L, 3))
    assert(binned(Seq(10L, 19L, 20L, 30L, 38L), ivs, 5L) == Set((10L, 1), (19L, 1)))
  }

  test("keyed variant joins only within the key, plan has no nested-loop join") {
    val pts = Seq((1L, "a"), (1L, "b")).toDF("ts", "k")
    val ivs = Seq((0L, 10L, "a", 1), (0L, 10L, "c", 2)).toDF("s", "e", "k", "iv_id")
    val joined = IntervalJoin.pointInInterval(pts, ivs, "ts", "s", "e", 5L, keyCols = Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(joined.select("ts", "k", "iv_id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2))).toSet == Set((1L, "a", 1)))
  }
}
