package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume-sensitivity probe for the streaming-gate bench rows: the
  * round-10 verdict's drain-trim proposal ("stage 7 files of 1/7th
  * current size") assumes per-batch cost is volume-dominated. This
  * probe measures that assumption directly — the SAME gate drained
  * with full-size and 1/7th-size batches (same file count, so the same
  * number of micro-batches) — and prints the engine-reported per-batch
  * durations for both. If the marginal barely moves, the per-batch cost
  * is the micro-batch FIXED floor (planning + state store + commit) and
  * shrinking batch volume cannot deliver the proposed wall reduction;
  * the honest trim is then fewer batches, not smaller ones.
  *
  * Two representatives: `q_dedup_stream`'s MinHash gate (the heaviest
  * per-batch work among the in-query gates: shingle → minhash → banded
  * index join per batch) and the windowed-aggregation restart gate
  * shape (`q_agg_interval_stream`: one AvailableNow restart per slice).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.BatchVolumeProbe
  */
object BatchVolumeProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // ---- in-query gate (MinHash dedup), full vs 1/7th batch volume
    val idxDocs = docs.filter(col("doc_id") % 2 === 0)
    graft.operators.Dedup.writeSignatureIndex(idxDocs, "bvp_sig_index")
    Seq(("full", lit(true)),
        ("seventh", pmod(col("doc_id"), lit(14)) === 1)).foreach {
      case (label, pred) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"bvp_$label").toString
        try {
          val staged = docs.filter(col("doc_id") % 2 === 1).filter(pred)
            .select("doc_id", "text", "source")
          val n = staged.count()
          staged.repartition(7).write.parquet(s"$tmp/input")
          val q = graft.streaming.DedupStream.start(spark, s"$tmp/input",
            "bvp_sig_index", idxDocs, s"$tmp/out", s"$tmp/cp",
            maxFilesPerTrigger = Some(1))
          val (_, wall) = time(q.awaitTermination())
          val ms = q.recentProgress.toSeq.map(_.batchDuration)
          val marginal = if (ms.length > 2)
            ms.tail.init.map(_.toDouble).sum / (ms.length - 2) / 1000 else -1.0
          println(s"""{"probe":"dedup_gate","variant":"$label","rows":$n,"drain_sec":${graft.util.JsonNum.fixed(wall)},"batches":${ms.length},"marginal_s":${graft.util.JsonNum.fixed(marginal)},"batch_ms":[${ms.mkString(",")}]}""")
        } finally graft.util.FsUtil.deleteRecursively(new java.io.File(tmp))
    }
    spark.sql("DROP TABLE IF EXISTS bvp_sig_index")

    // ---- restart-per-slice windowed agg, full vs 1/7th slice volume
    val conditions = graft.sources.EventsAsConditions.load(spark, sfDir)
    val s1 = 1704240000L
    val e1 = 1706399999L
    val bounds = Seq(s1, 1704600000L, 1704960000L, 1705320000L,
      1705680000L, 1706040000L, e1 + 1)
    Seq(("full", lit(true)),
        ("seventh", pmod(unix_micros(col("timestamp")), lit(7)) === 1)).foreach {
      case (label, pred) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"bvp_w_$label").toString
        try {
          val real = conditions.filter(
              col("timestamp") >= timestamp_seconds(lit(s1)) &&
              col("timestamp") <= timestamp_seconds(lit(e1))).filter(pred)
            .select("measurement_subject", "measurement_of",
              "measurement_number", "timestamp")
          val n = real.count()
          var runSecs = List.empty[Double]
          bounds.sliding(2).foreach { case Seq(a, b) =>
            real.filter(col("timestamp") >= timestamp_seconds(lit(a)) &&
                col("timestamp") < timestamp_seconds(lit(b)))
              .coalesce(1).write.mode("append").parquet(s"$tmp/input")
            val (_, sec) = time {
              graft.queries.TimeseriesQueries.streamingIntervalStats(
                  spark.readStream.schema(real.schema).parquet(s"$tmp/input"),
                  intervalS = 86400)
                .writeStream.format("parquet")
                .option("path", s"$tmp/out")
                .outputMode("append")
                .option("checkpointLocation", s"$tmp/cp")
                .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
                .start().awaitTermination()
            }
            runSecs = runSecs :+ sec
          case _ => ()
          }
          val marginal = runSecs.tail.sum / (runSecs.length - 1)
          println(s"""{"probe":"windowed_restart","variant":"$label","rows":$n,"runs":${runSecs.length},"marginal_s":${graft.util.JsonNum.fixed(marginal)},"run_s":[${runSecs.map(s => graft.util.JsonNum.fixed(s)).mkString(",")}]}""")
        } finally graft.util.FsUtil.deleteRecursively(new java.io.File(tmp))
    }
    spark.stop()
  }
}
