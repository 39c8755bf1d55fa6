package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** LTTB downsampling contracts: hand-computed selection on a tiny series,
  * plus the structural properties (count, endpoints, subset) on a larger
  * one.
  */
class LttbSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val T0 = 1704240000L

  private def series(rows: Seq[(Long, Double)], subj: String = "s1") = {
    import spark.implicits._
    rows.map { case (off, v) =>
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(T0 + off)),
        subj, "m", Option(v), Option.empty[String]) }
      .toDF("timestamp", "measurement_subject", "measurement_of",
        "measurement_number", "measurement_string")
  }

  test("series at or below threshold passes through unchanged") {
    val out = Lttb.downsample(series(Seq((0L, 1.0), (10L, 2.0), (20L, 3.0))),
      "m", T0, T0 + 100, threshold = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (T0 * 1000000L, 100L),
      ((T0 + 10) * 1000000L, 200L),
      ((T0 + 20) * 1000000L, 300L)))
  }

  test("hand-computed selection: the spike wins its bucket") {
    // 5 points, threshold 4 → interior buckets {idx 1} and {idx 2, 3}.
    // Bucket 2 holds a flat point (y=100) and a spike (y=1000): the spike
    // forms the visibly larger triangle with prev (idx 1) and last — LTTB
    // must keep it where a bucket-average would smear it.
    val out = Lttb.downsample(
      series(Seq((0L, 1.0), (10L, 1.0), (20L, 1.0), (30L, 10.0), (40L, 1.0))),
      "m", T0, T0 + 100, threshold = 4)
      .collect().map(r => ((r.getLong(1) - T0 * 1000000L) / 1000000L, r.getLong(2)))
    assert(out.toSeq == Seq((0L, 100L), (10L, 100L), (30L, 1000L), (40L, 100L)))
  }

  test("structural properties: count, endpoints, subset, per-subject isolation") {
    val pts = (0 until 500).map(i => (i.toLong * 60, math.sin(i / 7.0) * 10 + 12))
    val two = series(pts).unionByName(series(pts.map { case (t, v) => (t, v + 1) }, "s2"))
    val out = Lttb.downsample(two, "m", T0, T0 + 500 * 60, threshold = 25)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySubj = out.groupBy(_._1)
    assert(bySubj.keySet == Set("s1", "s2"))
    bySubj.foreach { case (_, rows) =>
      assert(rows.length == 25)
      assert(rows.head._2 == T0 * 1000000L)
      assert(rows.last._2 == (T0 + 499 * 60) * 1000000L)
    }
    // every selected point is an input point
    val inputSet = pts.map { case (t, v) =>
      ((T0 + t) * 1000000L, math.rint(v * 100).toLong) }.toSet
    val inputSet2 = pts.map { case (t, v) =>
      ((T0 + t) * 1000000L, math.rint((v + 1) * 100).toLong) }.toSet
    assert(bySubj("s1").forall(r => inputSet((r._2, r._3))))
    assert(bySubj("s2").forall(r => inputSet2((r._2, r._3))))
  }

  test("duplicate timestamps select deterministically (value breaks the tie)") {
    val dup = series(Seq((0L, 5.0), (10L, 3.0), (10L, 7.0), (20L, 3.0),
      (30L, 1.0), (40L, 2.0)))
    val a = Lttb.downsample(dup, "m", T0, T0 + 100, threshold = 4).collect()
    val b = Lttb.downsample(dup, "m", T0, T0 + 100, threshold = 4).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
