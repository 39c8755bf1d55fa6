package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BpeTokenizerSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hand-computed merge sequence on a 3-word corpus") {
    import spark.implicits._
    // words: aa(×1), ab(×3), aab(×1)
    // pairs: (a,a) = 2, (a,b) = 4 → merge 1 = (a,b) freq 4
    // then (a,a) = 1 ties (a,ab) = 1 → s2 tie-break picks (a,a)
    // then (a,ab) = 1; then no pairs remain → early stop at 3 merges
    val docs = Seq((0L, "aa ab aab"), (1L, "ab ab")).toDF("doc_id", "text")
    val merges = BpeTokenizer.train(docs, k = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges == Seq((1L, "a", "b", 4L), (2L, "a", "a", 1L), (3L, "a", "ab", 1L)),
      s"got $merges")
  }

  test("greedy merge order: aaaa collapses to (aa)(aa), not (aa)aa") {
    import spark.implicits._
    val docs = Seq((0L, "aaaa aaaa")).toDF("doc_id", "text")
    // merge 1 = (a,a) freq 6 (three adjacent pairs per word × 2 words)
    // after apply: <aa><aa> → merge 2 = (aa,aa) freq 2
    val merges = BpeTokenizer.train(docs, k = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges == Seq(("a", "a", 6L), ("aa", "aa", 2L)), s"got $merges")
  }

  test("encode counts post-merge tokens per doc") {
    import spark.implicits._
    val docs = Seq((0L, "aa ab aab"), (1L, "ab ab")).toDF("doc_id", "text")
    val merges = BpeTokenizer.train(docs, k = 10).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val counts = BpeTokenizer.encodeTokenCounts(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every word merges to a single token under the full merge table
    assert(counts == Map(0L -> 3L, 1L -> 2L), s"got $counts")
  }

  test("encodeTokens preserves word order; decode is the exact inverse") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "abab ab cd"),
      (2L, "zzz abab"),
      (3L, ""),           // empty text -> one empty word -> empty stream
      (4L, "a  b"))       // preserved double space (two splits, empty word)
      .toDF("doc_id", "text")
    val merges = Array(("a", "b"), ("ab", "ab"))
    val enc = BpeTokenizer.encodeTokens(docs, merges)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(enc(1L) == "<abab> <ab> <c><d>", enc(1L))
    assert(enc(2L) == "<z><z><z> <abab>", enc(2L))
    assert(enc(3L) == "", enc(3L))
    val dec = BpeTokenizer.encodeTokens(docs, merges)
      .select(col("doc_id"), BpeTokenizer.decode(col("encoded")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.collect().foreach { r =>
      assert(dec(r.getLong(0)) == r.getString(1),
        s"round trip broke for doc ${r.getLong(0)}")
    }
  }

  test("training is partitioning-independent on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = BpeTokenizer.train(docs, k = 4).collect().map(_.toSeq).toSeq
    val b = BpeTokenizer.train(docs.repartition(7), k = 4).collect().map(_.toSeq).toSeq
    assert(a == b, s"merge table must not depend on partitioning: $a vs $b")
    assert(a.length == 4)
  }
}
