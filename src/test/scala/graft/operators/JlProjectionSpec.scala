package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class JlProjectionSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("projection matrix is deterministic and ±1") {
    val a = Ann.jlSigns(seed = 7, outDim = 16, inDim = 64)
    val b = Ann.jlSigns(seed = 7, outDim = 16, inDim = 64)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(v => v == 1.0 || v == -1.0))
    // roughly balanced signs (md5 uniformity): 1024 draws, expect ~512
    val pos = a.flatten.count(_ == 1.0)
    assert(pos > 400 && pos < 624, s"sign balance off: $pos/1024")
    // a different seed gives a different matrix
    val c = Ann.jlSigns(seed = 8, outDim = 16, inDim = 64)
    assert(c.map(_.toSeq).toSeq != a.map(_.toSeq).toSeq)
  }

  test("projection preserves SEPARATED neighborhoods (planted near-dups)") {
    // JL preserves gaps, not hairline rank differences: plant 10 true
    // neighbors at cos ≈ 0.99 against a random background at cos ≈ 0, and
    // the 16-dim projection must retrieve them essentially perfectly.
    import spark.implicits._
    val rnd = new scala.util.Random(123)
    def randVec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val q = randVec()
    val neighbors = (1L to 10L).map { id =>
      (id, q.map(v => v + rnd.nextGaussian().toFloat * 0.1f).toSeq)
    }
    val background = (100L until 500L).map(id => (id, randVec().toSeq))
    val all = ((0L, q.toSeq) +: neighbors) ++ background
    val df = all.toDF("vec_id", "embedding")
    val proj = Ann.topK(Ann.jlProject(df, outDim = 16, seed = 7), queryId = 0, k = 11)
      .collect().map(_.getLong(0)).toSet
    val found = (proj & (1L to 10L).toSet).size
    assert(found >= 9, s"planted cos≈0.99 neighbors lost in projection: $found/10")
  }

  test("recall on hairline-gap corpus degrades but stays far above chance") {
    // the parquet embeddings are near-uniform (neighbors at cos ≈ 0.5
    // with tiny gaps) — JL's worst case; measured 6/20 at 16 dims vs
    // ≈0.8 expected by chance for a random 20-of-500
    val exact = Ann.topK(emb, queryId = 0, k = 20)
      .collect().map(_.getLong(0)).toSet
    val proj = Ann.topK(Ann.jlProject(emb, outDim = 16, seed = 7), queryId = 0, k = 20)
      .collect().map(_.getLong(0)).toSet
    assert((exact & proj).size >= 4,
      s"recall@20 collapsed to chance: ${(exact & proj).size}/20")
  }

  test("projected norms stay within JL distortion bounds on average") {
    import spark.implicits._
    val ratios = Ann.jlProject(emb, outDim = 16, seed = 7)
      .withColumnRenamed("embedding", "p")
      .join(emb, "vec_id")
      .as[(Long, Seq[Float], Seq[Float], Int)]
      .map { case (_, p, e, _) =>
        val np = math.sqrt(p.map(x => x.toDouble * x).sum)
        val ne = math.sqrt(e.map(x => x.toDouble * x).sum)
        np / ne
      }.collect()
    val mean = ratios.sum / ratios.length
    assert(mean > 0.85 && mean < 1.15, s"mean norm ratio drifted: $mean")
  }
}
