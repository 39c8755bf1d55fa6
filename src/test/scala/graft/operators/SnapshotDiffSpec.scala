package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot bookkeeping contracts: churn-only diff output and smoothed
  * KL drift terms on hand-computed corpora.
  */
class SnapshotDiffSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("diff labels added/removed/changed and drops unchanged") {
    import spark.implicits._
    val oldSnap = Seq((1L, "a b"), (2L, "c d"), (3L, "e f")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "c d"), (3L, "e f CHANGED"), (4L, "g h")).toDF("doc_id", "text")
    val out = SnapshotDiff.diff(oldSnap, newSnap)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("tokenDrift: hand-computed smoothed KL term, absent tokens stay finite") {
    import spark.implicits._
    // old: tokens a,a,b (T=3); new: a,c,c (T=3); union vocab V=3
    val oldSnap = Seq((1L, "a a b")).toDF("doc_id", "text")
    val newSnap = Seq((1L, "a c c")).toDF("doc_id", "text")
    val out = SnapshotDiff.tokenDrift(oldSnap, newSnap, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    def term(cn: Long, co: Long): Double = {
      val q = (cn + 1.0) / 6; val p = (co + 1.0) / 6
      math.rint(q * math.log(q / p) * 1e6) / 1e6
    }
    assert(out.toSeq == Seq(
      ("a", 2L, 1L, term(1, 2)),
      ("b", 1L, 0L, term(0, 1)),
      ("c", 0L, 2L, term(2, 0))))
  }

  test("tokenDrift top-k ranks by absolute contribution") {
    import spark.implicits._
    val oldSnap = Seq((1L, "x x x x x x x x y")).toDF("doc_id", "text")
    val newSnap = Seq((1L, "y y y y y y y y x")).toDF("doc_id", "text")
    val top = SnapshotDiff.tokenDrift(oldSnap, newSnap, k = 1).collect()
    assert(top.length == 1) // the mover with the largest |term| wins the cut
  }
}
