package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the UniMax water-filling allocation. The
  * closed-form algorithm is replicated in plain JVM code (`jvmAlloc`)
  * and cross-checked against the Spark window implementation on corpus
  * cases; the allocation invariants then run at ScalaCheck volume on
  * the replica.
  */
class UnimaxPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The same water-filling: caps ascending, k* = the monotone funded
    * prefix, uniform integer share for the rest.
    */
  private def jvmAlloc(caps: Seq[(String, Long)], budget: Long): Map[String, Long] = {
    val sorted = caps.sortBy { case (n, c) => (c, n) }
    val l = sorted.length
    val prefix = sorted.scanLeft(0L)(_ + _._2)
    val funded = (1 to l).takeWhile { k =>
      sorted(k - 1)._2 * (l - k + 1) + prefix(k - 1) <= budget
    }
    val kStar = funded.lastOption.getOrElse(0)
    val sk = prefix(kStar)
    val share = if (kStar == l) 0L else (budget - sk) / (l - kStar)
    sorted.zipWithIndex.map { case ((n, c), i) =>
      n -> (if (i < kStar) c else share)
    }.toMap
  }

  private val capsGen: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 8)
    caps <- Gen.listOfN(n, Gen.choose(1L, 10000L))
  } yield caps.zipWithIndex.map { case (c, i) => (s"l$i", c) }

  test("allocation invariants at ScalaCheck volume") {
    val p = Prop.forAll(capsGen, Gen.choose(1L, 60000L)) { (caps, budget) =>
      val q = jvmAlloc(caps, budget)
      val total = q.values.sum
      val l = caps.length
      val capOf = caps.toMap
      val capped = total == capOf.values.sum // budget covers everything
      (q.values.forall(_ >= 0)) &&
        q.forall { case (n, v) => v <= capOf(n) } && // never exceed a cap
        total <= budget &&
        // flooring leaves < L unspent unless every cap is exhausted
        (capped || budget - total < l)
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p).passed)
  }

  test("raising the budget never lowers any stratum's quota") {
    val p = Prop.forAll(capsGen, Gen.choose(1L, 30000L), Gen.choose(0L, 30000L)) {
      (caps, budget, extra) =>
        val q1 = jvmAlloc(caps, budget)
        val q2 = jvmAlloc(caps, budget + extra)
        caps.forall { case (n, _) => q2(n) >= q1(n) }
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p).passed)
  }

  test("spark implementation matches the JVM replica on corpus strata") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    for (budget <- Seq(50L, 420L, 499L, 10000L)) {
      val expect = jvmAlloc(counts, budget)
        .map { case (lang, q) => lang -> math.min(q, counts.toMap.apply(lang)) }
        .filter(_._2 > 0)
      val got = Sampling.unimaxSample(docs, budget)
        .groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect, s"budget $budget: got $got expect $expect")
    }
  }
}
