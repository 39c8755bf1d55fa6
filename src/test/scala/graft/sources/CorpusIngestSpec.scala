package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CorpusIngestSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withTmp[T](f: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("corpus_ingest_spec")
    try f(dir.toString)
    finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("hostile text round-trips; corrupt lines route verbatim") {
    import spark.implicits._
    withTmp { tmp =>
      // quotes, newline escapes, unicode, JSON-looking content — the
      // writer must escape, the reader must reconstruct byte-for-byte
      val docs = Seq(
        (0L, """he said "hi" and left""", "en", "s"),
        (1L, "line1\nline2\ttabbed", "en", "s"),
        (2L, """{"fake": "json", "n": [1,2]}""", "zh", "s"),
        (3L, "emoji ❤ and cjk 中文", "zh", "s"))
        .toDF("doc_id", "text", "lang", "source")
      docs.write.json(s"$tmp/drop")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/drop/part-bad.json"),
        "{broken\n[1,2\n".getBytes("UTF-8"))
      val (good, bad) = CorpusIngest.readJsonlRouted(spark, s"$tmp/drop")
      val got = good.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      val want = docs.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == want, "text must survive the JSONL round trip exactly")
      val letters = bad.collect().map(_.getString(0)).toSet
      assert(letters == Set("{broken", "[1,2"),
        s"dead letters must carry the offending lines verbatim: $letters")
    }
  }

  test("missing fields are nulls (schema drift), not dead letters") {
    withTmp { tmp =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/only.json"),
        """{"doc_id": 7, "text": "no lang field"}
          |""".stripMargin.getBytes("UTF-8"))
      val (good, bad) = CorpusIngest.readJsonlRouted(spark, tmp)
      assert(bad.count() == 0)
      val row = good.collect().head
      assert(row.getLong(0) == 7L && row.isNullAt(2),
        "absent fields parse as nulls under the explicit schema")
    }
  }
}
