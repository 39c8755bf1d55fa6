package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MmrSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def vecs(rows: (Long, Array[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("MMR demotes a near-duplicate that plain top-k ranks second") {
    // query 0 = e1; vec 1 = almost e1; vec 2 = a verbatim copy of vec 1;
    // vec 3 = e2-ish (orthogonal-ish but still positive cos to query)
    val e = vecs(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0.99f, 0.1f, 0f, 0f),
      2L -> Array(0.99f, 0.1f, 0f, 0f),
      3L -> Array(0.5f, 0f, 0.9f, 0f))
    // topK keeps the query row itself (rank 1, cos 1); MMR's candidate
    // pool excludes it — compare against the non-self tail
    val topk = Ann.topK(e, queryId = 0, k = 4).collect().map(_.getLong(0)).toSeq
    assert(topk == Seq(0L, 1L, 2L, 3L), s"plain top-k ranks the copy 2nd: $topk")
    // λ=0.5: an exact duplicate (pairwise cos 1) scores 0.5·cos − 0.5,
    // below any candidate whose marginal gain is positive
    val mmr = Ann.mmrTopK(e, queryId = 0, kCand = 3, kOut = 2, lambda = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(mmr.map(_._2) == Seq(1L, 3L),
      s"MMR must pick the diverse vec 3 over the duplicate vec 2: $mmr")
  }

  test("MMR at lambda=1 degenerates to plain top-k order") {
    val e = vecs(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0.9f, 0.2f, 0f, 0f),
      2L -> Array(0.9f, 0.19f, 0f, 0f),
      3L -> Array(0.1f, 0.9f, 0f, 0f))
    val topk = Ann.topK(e, queryId = 0, k = 4).collect().map(_.getLong(0))
      .filter(_ != 0L).toSeq
    val mmr = Ann.mmrTopK(e, queryId = 0, kCand = 3, kOut = 3, lambda = 1.0)
      .collect().map(_.getLong(1)).toSeq
    assert(mmr == topk, s"lambda=1 ignores redundancy: mmr=$mmr topk=$topk")
  }

  test("MMR output ranks are 1..kOut and partitioning-independent") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Ann.mmrTopK(e, queryId = 0, kCand = 15, kOut = 6).collect()
    val b = Ann.mmrTopK(e.repartition(7), queryId = 0, kCand = 15, kOut = 6).collect()
    assert(a.map(_.getLong(0)).toSeq == (1L to 6L))
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq,
      "rerank must not depend on input partitioning")
  }

  test("kCenters: farthest-point traversal, hand-computed pick order") {
    // start at min id (1, pointing at e1); farthest is the antipode (4),
    // then the orthogonal (3); the 5-degree near-copy (2) is picked last
    val e = vecs(
      1L -> Array(1f, 0f),
      2L -> Array(0.9962f, 0.0872f),
      3L -> Array(0f, 1f),
      4L -> Array(-1f, 0f))
    val got = Ann.kCenters(e, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 4L), (3L, 3L)), s"got $got")
    // dist column: rank 1 null, then the covering radius at selection,
    // non-increasing
    val d = Ann.kCenters(e, k = 4).collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    assert(d(0).isEmpty)
    assert(d.flatten.sliding(2).forall(p => p.head >= p.last),
      s"covering radius must be non-increasing: ${d.toSeq}")
  }

  test("kCenters: k beyond corpus size stops at n; partition independent") {
    val e = vecs(
      1L -> Array(1f, 0f), 2L -> Array(0f, 1f), 3L -> Array(-1f, 0.2f))
    assert(Ann.kCenters(e, k = 10).count() == 3)
    val a = Ann.kCenters(e.repartition(5), k = 3).collect().map(_.toSeq).toSeq
    val b = Ann.kCenters(e.coalesce(1), k = 3).collect().map(_.toSeq).toSeq
    assert(a == b, "selection must not depend on input partitioning")
  }
}
