package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Character-level span dedup contracts on hand-built documents with
  * known copied regions.
  */
class SpanDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("duplicatedSpans finds a cross-document copied region and merges windows") {
    import spark.implicits._
    // 12-char copied block "SHARED-BLOCK" inside distinct noise; L=6 →
    // windows at pos 5..11 of doc 1 / 3..9 of doc 2 duplicate and merge
    val docs = Seq(
      (1L, "aaaaSHARED-BLOCKzzzz"),
      (2L, "bbSHARED-BLOCKyyyyyy")
    ).toDF("doc_id", "text")
    val out = SpanDedup.duplicatedSpans(docs, minLen = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 5L, 16L, 7L), (2L, 3L, 14L, 7L)))
  }

  test("within-document repetition counts as duplication") {
    import spark.implicits._
    val docs = Seq((1L, "xxABCDEFxx..ABCDEFyy")).toDF("doc_id", "text")
    val out = SpanDedup.duplicatedSpans(docs, minLen = 6)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((3L, 8L), (13L, 18L)))
  }

  test("unique text yields no spans; short docs are skipped, not crashed") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij"), (2L, "qrs")).toDF("doc_id", "text")
    assert(SpanDedup.duplicatedSpans(docs, minLen = 6).collect().isEmpty)
  }

  test("stripSpans excises ranges and passes span-free documents through") {
    import spark.implicits._
    val docs = Seq((1L, "aaaaSHARED-BLOCKzzzz"), (3L, "untouched")).toDF("doc_id", "text")
    val spans = Seq((1L, 5L, 16L)).toDF("doc_id", "span_start", "span_end")
    val out = SpanDedup.stripSpans(docs, spans)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "aaaazzzz", 3L -> "untouched"))
  }

  test("stripSpans merges overlapping ranges without double-cutting") {
    import spark.implicits._
    val docs = Seq((1L, "0123456789")).toDF("doc_id", "text")
    // 1-based [2,5] and [4,7] → chars 2..7 removed, keeping "1" prefix? no:
    // positions 1 and 8,9,10 survive → "0789"
    val spans = Seq((1L, 2L, 5L), (1L, 4L, 7L)).toDF("doc_id", "span_start", "span_end")
    val out = SpanDedup.stripSpans(docs, spans).collect().head.getString(1)
    assert(out == "0789")
  }
}
