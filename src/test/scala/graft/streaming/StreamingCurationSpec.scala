package graft.streaming

import java.nio.file.Files

import graft.operators.{Redaction, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stateless curation stage (PII redaction → split assignment →
  * split routing) is a narrow projection pipeline, so the SAME operator
  * code must run under Structured Streaming unchanged — this is the
  * incremental-ingest path of a training-data pipeline (new crawl
  * snapshots stream in; their curation must not depend on batch
  * boundaries).
  */
class StreamingCurationSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The stage under test — identical code path for batch and stream. */
  private def stage(docs: DataFrame): DataFrame =
    Sampling.assignSplits(Redaction.redact(docs))
      .filter(col("split") === "train")
      .select("doc_id", "n_pii", "redacted", "split")

  test("streamed curation stage emits exactly the batch result, across restarts") {
    val srcDir = Files.createTempDirectory("cur_src").toString
    val ckpt = Files.createTempDirectory("cur_ckpt").toString
    val outDir = Files.createTempDirectory("cur_out").toString

    val batch = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (first, second) = (batch.filter(col("doc_id") % 2 === 0),
      batch.filter(col("doc_id") % 2 =!= 0))

    def run(): Unit = {
      val stream = spark.readStream.schema(batch.schema).parquet(srcDir)
      val q = stage(stream)
        .writeStream.format("parquet")
        .option("path", outDir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000),
        "streaming batch did not finish within the timeout")
    }

    // two arrivals over one checkpoint: batch-boundary independence
    first.coalesce(1).write.mode("append").parquet(srcDir)
    run()
    second.coalesce(1).write.mode("append").parquet(srcDir)
    run()

    val streamed = spark.read.parquet(outDir).collect().map(_.toSeq).toSet
    val expected = stage(batch).collect().map(_.toSeq).toSet
    assert(streamed == expected)
    assert(streamed.nonEmpty)
  }

  test("streaming sessionization: closed sessions equal the batch computation") {
    import graft.queries.TimeseriesQueries
    import graft.sources.EventsAsConditions
    val srcDir = Files.createTempDirectory("sess_src").toString
    val ckpt = Files.createTempDirectory("sess_ckpt").toString
    val outDir = Files.createTempDirectory("sess_out").toString
    val conds = EventsAsConditions.load(spark, "/root/testdata/sf0.001")
      .filter(col("measurement_of") === "click")
    val cut = lit("2024-01-20").cast("timestamp")

    def run(): Unit = {
      val stream = spark.readStream.schema(conds.schema).parquet(srcDir)
      val q = TimeseriesQueries.streamingSessionize(stream, gapS = 7200)
        .writeStream.format("parquet")
        .option("path", outDir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "streaming batch did not finish")
    }
    conds.filter(col("timestamp") < cut).coalesce(1).write.mode("append").parquet(srcDir)
    run()
    conds.filter(col("timestamp") >= cut).coalesce(1).write.mode("append").parquet(srcDir)
    run()

    // streamed rows: (subject, start, end, n) of sessions the watermark closed
    val streamed = spark.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batchAll = TimeseriesQueries
      .sessionize(conds, "click", 0L, 4102444800L, gapS = 7200)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(streamed.nonEmpty)
    // every emitted session must match batch exactly (same boundary
    // behavior on this data: no gap of exactly 7200 s)
    assert(streamed.subsetOf(batchAll), s"extra=${streamed -- batchAll}")
    // completeness: all sessions the phase-1 watermark provably closed
    // (ending > 1h + gap before the phase-1 max event time) were emitted
    val phase1Max = conds.filter(col("timestamp") < cut)
      .agg(org.apache.spark.sql.functions.max(unix_micros(col("timestamp"))))
      .head().getLong(0)
    val closedBound = phase1Max - (3600L + 7200L) * 1000000L
    val mustEmit = batchAll.filter(_._3 < closedBound)
    assert(mustEmit.subsetOf(streamed), s"missing=${mustEmit -- streamed}")
  }
}
