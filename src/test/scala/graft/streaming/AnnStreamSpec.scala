package graft.streaming

import java.nio.file.Files

import graft.operators.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming embedding near-dup gate vs the batch persisted-index tier:
  * the streamed survivor set must equal the batch anti-join, regardless
  * of micro-batch boundaries (maxFilesPerTrigger=1 forces several).
  */
class AnnStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streamed gate == batch anti-join across micro-batch boundaries") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idxVecs = emb.filter(col("vec_id") % 2 === 0)
    val newVecs = emb.filter(col("vec_id") % 2 === 1).select("vec_id", "embedding")
    Ann.writeIvfIndex(idxVecs, "ann_stream_spec_index", nlist = 8)
    try {
      val tmp = Files.createTempDirectory("as").toString
      val (in, out, cp) = (s"$tmp/in", s"$tmp/out", s"$tmp/cp")
      newVecs.repartition(4).write.parquet(in)
      AnnStream.start(spark, in, "ann_stream_spec_index", out, cp,
        threshold = 0.45, nProbe = 8, maxFilesPerTrigger = Some(1))
        .awaitTermination()
      val streamed = spark.read.parquet(out)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val batchDups = Ann.neardupAgainstIvfIndex(
          newVecs, "ann_stream_spec_index", threshold = 0.45, nProbe = 8)
        .select("id_new").collect().map(_.getLong(0)).toSet
      val expected = newVecs.select("vec_id").collect().map(_.getLong(0)).toSet -- batchDups
      assert(streamed == expected)
      assert(batchDups.nonEmpty, "fixture should contain at least one cross-slice near-dup")
    } finally spark.sql("DROP TABLE IF EXISTS ann_stream_spec_index")
  }
}
