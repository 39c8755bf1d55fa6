package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end retrieval: the chunk containing the query's tokens must
  * surface first, and chunk keys must unpack to the right (doc, chunk).
  */
class RagSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("retrieveChunks: the planted relevant chunk ranks first with its unpacked key") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z w alpha beta gamma q"), // chunk 1 carries the query terms
      (2L, "p q r s"),
      (3L, "alpha n o p")                 // partial overlap — must rank below
    ).toDF("doc_id", "text")
    val got = Rag.retrieveChunks(docs, "alpha beta gamma", k = 3,
        maxTokens = 4, overlap = 0, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.head._1 == 1L && got.head._2 == 1L,
      s"the chunk holding the query terms must rank first: ${got.toSeq}")
    assert(got.head._3 > got(1)._3,
      s"full match must outscore partial matches: ${got.toSeq}")
    assert(got.map(_._3).sliding(2).forall(p => p.head >= p.last))
  }

  test("retrieveChunks: k bounds the result; self key -1 never appears") {
    import spark.implicits._
    val docs = (1L to 5L).map(i => (i, s"tok$i a b c")).toDF("doc_id", "text")
    val got = Rag.retrieveChunks(docs, "a b", k = 2, maxTokens = 4,
      overlap = 0, dim = 16).collect()
    assert(got.length == 2)
    assert(got.forall(_.getLong(0) >= 1L))
  }
}
