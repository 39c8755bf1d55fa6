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
  test("appendAccepted closes the in-stream duplicate window (order-independent)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idxVecs = emb.filter(col("vec_id") % 2 === 0)
    val newVecs = emb.filter(col("vec_id") % 2 === 1).select("vec_id", "embedding")
    // plant an exact in-stream duplicate of odd vector 1 under a new id;
    // at threshold 0.999 the only near-dup pair in play is orig<->copy
    // (no exact duplicates exist across the odd/even slices)
    val copy = newVecs.filter(col("vec_id") === 1L)
      .select((col("vec_id") + 999000L).as("vec_id"), col("embedding"))
    Ann.writeIvfIndex(idxVecs, "ann_stream_app_idx", nlist = 8)
    try {
      val tmp = Files.createTempDirectory("asa").toString
      val (in, out, cp) = (s"$tmp/in", s"$tmp/out", s"$tmp/cp")
      // the copy gets its own file => its own micro-batch under
      // maxFilesPerTrigger=1 (whichever side runs first, exactly one of
      // the pair must survive)
      newVecs.repartition(2).write.parquet(in)
      copy.coalesce(1).write.mode("append").parquet(in)
      AnnStream.start(spark, in, "ann_stream_app_idx", out, cp,
        threshold = 0.999, nProbe = 8, maxFilesPerTrigger = Some(1),
        appendAccepted = true)
        .awaitTermination()
      val survivors = spark.read.parquet(out)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val pair = Set(1L, 999001L)
      assert(survivors.intersect(pair).size == 1,
        s"expected exactly one of the in-stream duplicate pair, got ${survivors.intersect(pair)}")
      // everything else passes (nothing matches at 0.999)
      assert(survivors.size == newVecs.count() + copy.count() - 1)
      // and the accepted vectors were appended: the index now contains
      // every survivor
      val indexed = spark.table("ann_stream_app_idx")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(survivors.subsetOf(indexed))
    } finally spark.sql("DROP TABLE IF EXISTS ann_stream_app_idx")
  }
}
