package graft.streaming

import graft.operators.LinkGraph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinkStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("startPagerank: per-batch ranks equal the from-scratch recompute " +
      "over everything appended so far (incremental ≡ from-scratch)") {
    import spark.implicits._
    val all = (0L until 240L)
      .map(i => (s"https://h${i % 12}.com/p${i % 7}",
        s"https://h${(i * 5 + 1) % 12}.com/p${(i * 3 + 2) % 7}"))
      .filter { case (a, b) => a != b }
      .distinct
    val (seed, streamed) = all.partition { case (a, b) => (a + b).hashCode % 2 == 0 }
    val tmp = java.nio.file.Files.createTempDirectory("graft_lstream").toString
    try {
      LinkGraph.writeEdgeIndex(seed.toDF("src", "dst"), "graft_test_edge_stream")
      // stage 3 single-file batches into ONE flat dir (the file source
      // lists it non-recursively; maxFilesPerTrigger=1 ⇒ 3 batches)
      val flat = new java.io.File(s"$tmp/in"); flat.mkdirs()
      streamed.grouped((streamed.size + 2) / 3).zipWithIndex.foreach {
        case (chunk, i) =>
          chunk.toDF("src", "dst").coalesce(1)
            .write.parquet(s"$tmp/input/f$i")
          new java.io.File(s"$tmp/input/f$i").listFiles
            .filter(_.getName.endsWith(".parquet")).zipWithIndex
            .foreach { case (f, j) =>
              java.nio.file.Files.move(f.toPath,
                java.nio.file.Paths.get(s"$tmp/in/part-$i-$j.parquet"))
            }
      }
      val q = LinkStream.startPagerank(spark, s"$tmp/in",
        "graft_test_edge_stream", s"$tmp/out", s"$tmp/cp",
        maxFilesPerTrigger = Some(1))
      q.awaitTermination()
      val out = spark.read.parquet(s"$tmp/out")
      val nBatches = out.select("batch_id").distinct().count()
      assert(nBatches == 3, s"expected 3 batches, got $nBatches")
      // final batch must equal the from-scratch run over ALL edges
      val got = LinkStream.latestRanks(spark, s"$tmp/out")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = LinkGraph.pagerank(all.toDF("src", "dst"), iters = 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want,
        s"streamed final ranks diverged: got ${got.size} urls, want ${want.size}")
      // REPLAY: wipe the checkpoint so every batch re-runs against the
      // already-complete index and output dirs (the worst-case
      // at-least-once window). Per-batch-dir overwrite must leave the
      // output duplicate-free and the latest ranks unchanged.
      graft.util.FsUtil.deleteRecursively(new java.io.File(s"$tmp/cp"))
      LinkStream.startPagerank(spark, s"$tmp/in", "graft_test_edge_stream",
        s"$tmp/out", s"$tmp/cp", maxFilesPerTrigger = Some(1))
        .awaitTermination()
      val replayed = LinkStream.latestRanks(spark, s"$tmp/out")
      val rows = replayed.collect().map(r => r.getString(0) -> r.getLong(1))
      assert(rows.length == rows.map(_._1).distinct.length,
        "replay produced duplicated (url, rank) rows")
      assert(rows.toMap == want, "replay changed the latest ranks")
    } finally {
      graft.util.FsUtil.deleteRecursively(new java.io.File(tmp))
      spark.sql("DROP TABLE IF EXISTS graft_test_edge_stream")
    }
  }

  test("recomputeEveryN: appends run every batch, ranks only on every " +
      "Nth — latest ranks are as-of the last recompute batch; " +
      "recomputeNow flushes the tail") {
    import spark.implicits._
    val all = (0L until 180L)
      .map(i => (s"https://h${i % 10}.com/p${i % 5}",
        s"https://h${(i * 7 + 1) % 10}.com/p${(i * 3 + 2) % 5}"))
      .filter { case (a, b) => a != b }
      .distinct
    val (seed, streamed) = all.partition { case (a, b) => (a + b).hashCode % 2 == 0 }
    val tmp = java.nio.file.Files.createTempDirectory("graft_lstream_n").toString
    try {
      LinkGraph.writeEdgeIndex(seed.toDF("src", "dst"), "graft_test_edge_n")
      val flat = new java.io.File(s"$tmp/in"); flat.mkdirs()
      val chunks = streamed.grouped((streamed.size + 2) / 3).toSeq
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        chunk.toDF("src", "dst").coalesce(1).write.parquet(s"$tmp/input/f$i")
        new java.io.File(s"$tmp/input/f$i").listFiles
          .filter(_.getName.endsWith(".parquet")).zipWithIndex
          .foreach { case (f, j) =>
            java.nio.file.Files.move(f.toPath,
              java.nio.file.Paths.get(s"$tmp/in/part-$i-$j.parquet"))
          }
      }
      // 3 batches, N=2: only batch 1 recomputes — ranks are as-of
      // seed + chunks 0 and 1, chunk 2 is appended but unranked
      LinkStream.startPagerank(spark, s"$tmp/in", "graft_test_edge_n",
        s"$tmp/out", s"$tmp/cp", maxFilesPerTrigger = Some(1),
        recomputeEveryN = 2).awaitTermination()
      val emitted = spark.read.parquet(s"$tmp/out")
        .select("batch_id").distinct().count()
      assert(emitted == 1, s"expected 1 recompute batch, got $emitted")
      val got = LinkStream.latestRanks(spark, s"$tmp/out")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val asOf1 = LinkGraph.pagerank(
          (seed ++ chunks(0) ++ chunks(1)).toDF("src", "dst"), iters = 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == asOf1, "ranks must be as-of the last RECOMPUTE batch")
      // the flush: a forced recompute over the full index catches up
      LinkStream.recomputeNow(spark, "graft_test_edge_n", s"$tmp/out",
        batchId = 99L)
      val flushed = LinkStream.latestRanks(spark, s"$tmp/out")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = LinkGraph.pagerank(all.toDF("src", "dst"), iters = 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(flushed == want, "recomputeNow must equal the from-scratch run")
    } finally {
      graft.util.FsUtil.deleteRecursively(new java.io.File(tmp))
      spark.sql("DROP TABLE IF EXISTS graft_test_edge_n")
    }
  }
}
