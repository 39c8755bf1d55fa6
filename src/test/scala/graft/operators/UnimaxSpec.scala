package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class UnimaxSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus(sizes: (String, Int)*) = {
    import spark.implicits._
    var id = -1L
    sizes.flatMap { case (lang, n) =>
      (0 until n).map { _ => id += 1; (id, lang) }
    }.toDF("doc_id", "lang")
  }

  private def langCounts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("hand-computed water-filling: small langs funded, big lang downsampled") {
    // caps (E=1) sorted: a=10, b=20, c=100; budget 60
    // k=1: 10*3+0=30 <= 60 ✓; k=2: 20*2+10=50 <= 60 ✓; k=3: 100+30=130 > 60
    // → k*=2, quota: a=10, b=20, c=(60-30) div 1 = 30
    val got = langCounts(Sampling.unimaxSample(
      corpus("a" -> 10, "b" -> 20, "c" -> 100), budget = 60))
    assert(got == Map("a" -> 10L, "b" -> 20L, "c" -> 30L), s"got $got")
  }

  test("budget below the smallest cap spreads uniformly") {
    // k*=0 → every lang gets budget div L = 4
    val got = langCounts(Sampling.unimaxSample(
      corpus("a" -> 30, "b" -> 40, "c" -> 50), budget = 12))
    assert(got == Map("a" -> 4L, "b" -> 4L, "c" -> 4L), s"got $got")
  }

  test("budget above the total corpus keeps everything (1 epoch)") {
    val got = langCounts(Sampling.unimaxSample(
      corpus("a" -> 5, "b" -> 7), budget = 1000))
    assert(got == Map("a" -> 5L, "b" -> 7L), s"got $got")
  }

  test("epoch cap > 1 raises a stratum's ceiling but selection stops at its size") {
    // caps (E=2): a=20, b=40; budget 50: k=1: 20*2=40 <= 50 ✓;
    // k=2: 40+20=60 > 50 → a capped at 20 (but only 10 docs exist → 10),
    // b = (50-20) div 1 = 30
    val got = langCounts(Sampling.unimaxSample(
      corpus("a" -> 10, "b" -> 20), budget = 50, epochs = 2.0))
    assert(got == Map("a" -> 10L, "b" -> 20L), s"got $got")
  }

  test("selection is deterministic and partitioning-independent on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Sampling.unimaxSample(docs, budget = 420)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.unimaxSample(docs.repartition(7), budget = 420)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    assert(a.length == 420, s"budget must be exactly spent: ${a.length}")
  }
}
