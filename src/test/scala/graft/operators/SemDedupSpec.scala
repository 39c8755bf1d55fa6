package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup contracts: cluster-bounded near-dup pruning with a
  * deterministic keep rule, on hand-built geometry where assignments and
  * duplicate groups are known exactly.
  */
class SemDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // two well-separated directions; ids 0/1/2 near +x, 10/11 near +y
  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),          // exact dup of 0
      (2L, Array(0.999f, 0.04f, 0.0f)),       // near-dup of 0 (cos ≈ 0.9992)
      (10L, Array(0.0f, 1.0f, 0.0f)),
      (11L, Array(0.0f, 0.999f, 0.05f))       // near-dup of 10
    ).toDF("vec_id", "embedding")
  }

  private def seeds = {
    import spark.implicits._
    Seq((0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("list_id", "centroid")
  }

  test("assignment is max-cosine with lowest-list tie break") {
    val a = SemDedup.assignToCentroids(corpus, seeds)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 1L, 11L -> 1L))
  }

  test("semDedup keeps one representative per within-cluster duplicate group") {
    val out = SemDedup.semDedup(corpus, seeds, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (0L, 0L, 0L, true),    // representative of {0,1,2}
      (1L, 0L, 0L, false),
      (2L, 0L, 0L, false),
      (10L, 1L, 10L, true),  // representative of {10,11}
      (11L, 1L, 10L, false)))
  }

  test("pairs never cross a cluster boundary even above threshold") {
    import spark.implicits._
    // two identical vectors pushed to different clusters by tiny nudges:
    // cross-cluster cos ≈ 1 but must produce NO pair
    val split = Seq(
      (0L, Array(1.0f, 0.001f, 0.0f)),
      (1L, Array(1.0f, -0.001f, 0.0f))
    ).toDF("vec_id", "embedding")
    val twoSeeds = Seq((0L, Array(1.0f, 1.0f, 0.0f)), (1L, Array(1.0f, -1.0f, 0.0f)))
      .toDF("list_id", "centroid")
    val pairs = SemDedup.withinClusterPairs(
      SemDedup.assignToCentroids(split, twoSeeds), threshold = 0.9).collect()
    assert(pairs.isEmpty)
  }

  test("trainedCentroids production path reproduces the planted duplicate groups") {
    import spark.implicits._
    // 40 spread vectors + 2 exact clones; kmeans centroids are not
    // replayable, but clone pairs survive ANY assignment (identical
    // vectors always share a cluster)
    val base = (0L until 40L).map { i =>
      val t = i.toFloat / 40f
      (i, Array(math.cos(t * 6).toFloat, math.sin(t * 6).toFloat, t))
    }
    val clones = Seq((100L, base(5)._2), (101L, base(25)._2))
    val df = (base ++ clones).toDF("vec_id", "embedding")
    val cents = SemDedup.trainedCentroids(df, nlist = 4, sampleSize = 64)
    val out = SemDedup.semDedup(df, cents, threshold = 0.999999)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(!out(100L) && !out(101L), "clones must be dropped")
    assert(out(5L) && out(25L), "originals must be kept")
  }

  test("centroidsFromIvfIndex: SemDeDup runs against a persisted index's centroids") {
    import spark.implicits._
    val base = (0L until 60L).map { i =>
      val r = new java.util.Random(i)
      (i, Array.fill(16)(r.nextGaussian().toFloat))
    }
    val clones = Seq((200L, base(3)._2), (201L, base(42)._2))
    val df = (base ++ clones).toDF("vec_id", "embedding")
    Ann.writeIvfIndex(df, "semdedup_ivf_idx", nlist = 4)
    try {
      val cents = SemDedup.centroidsFromIvfIndex(spark, "semdedup_ivf_idx")
      assert(cents.columns.toSeq == Seq("list_id", "centroid"))
      val out = SemDedup.semDedup(df, cents, threshold = 0.999999)
        .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
      assert(!out(200L) && !out(201L) && out(3L) && out(42L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS semdedup_ivf_idx")
      spark.sql("DROP TABLE IF EXISTS semdedup_ivf_idx_centroids")
    }
  }

  test("dimension mismatch and zero-norm centroids fail loudly") {
    import spark.implicits._
    val bad = Seq((0L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    intercept[Exception] {
      SemDedup.assignToCentroids(bad, seeds).collect()
    }
    val zeroSeed = Seq((0L, Array(0.0f, 0.0f, 0.0f))).toDF("list_id", "centroid")
    intercept[IllegalArgumentException] {
      SemDedup.assignToCentroids(corpus, zeroSeed).collect()
    }
  }
}
