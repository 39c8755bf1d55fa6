package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BatchBucketsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("every batch stays inside one length bucket and respects batchSize") {
    val out = Packing.lengthBucketedBatches(docs, batchSize = 8,
      bucketWidth = 16, numShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    assert(out.length == docs.count())
    val byBatch = out.groupBy(_._5)
    byBatch.foreach { case (batchId, rows) =>
      assert(rows.length <= 8, s"batch $batchId overflows: ${rows.length}")
      val buckets = rows.map(_._3).distinct
      assert(buckets.length == 1, s"batch $batchId spans buckets $buckets")
      val lens = rows.map(_._2)
      assert(lens.max - lens.min < 16,
        s"batch $batchId padding spread ${lens.max - lens.min} >= bucketWidth")
    }
    // at most one short batch per (bucket, shard): the tail one
    byBatch.groupBy { case (_, rows) => (rows.head._3, rows.head._4) }
      .foreach { case (bs, batches) =>
        val short = batches.count { case (_, rows) => rows.length < 8 }
        assert(short <= 1, s"(bucket, shard) $bs has $short short batches")
      }
  }

  test("assignment is deterministic and partitioning-independent") {
    val a = Packing.lengthBucketedBatches(docs, 8, 16, 4)
      .collect().map(_.toSeq).toSeq
    val b = Packing.lengthBucketedBatches(docs.repartition(7), 8, 16, 4)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("fertility: hand-computed on a dialect corpus") {
    import spark.implicits._
    // merges learned from the corpus fully merge 'ab'; 'xyz' never merges
    // (each char distinct, but pairs (x,y),(y,z) do get learned in order)
    val d = Seq((0L, "ab ab ab ab", "aa"), (1L, "xyz", "bb"))
      .toDF("doc_id", "text", "lang")
    val merges = BpeTokenizer.train(d, k = 1).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(merges.toSeq == Seq(("a", "b"))) // freq 4 beats (x,y)/(y,z) freq 1
    val f = BpeTokenizer.fertilityByStratum(d, merges).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // aa: 4 words -> 4 tokens (all merged), fertility 1.0
    // bb: 1 word 'xyz' -> 3 tokens (no merge applies), fertility 3.0
    assert(f == Seq(("aa", 4L, 4L, 1.0), ("bb", 3L, 1L, 3.0)), s"got $f")
  }
}
