package graft.tools

import graft.sources.EventsAsConditions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-batch duration breakdown for the two streaming bench shapes,
  * from the engine's own `StreamingQueryProgress.durationMs` — answers
  * "where does a 0.4–3 s micro-batch actually go": addBatch (the real
  * work), queryPlanning (per-batch Catalyst), walCommit/commitOffsets
  * (offset+commit log I/O), getBatch/latestOffset (source listing),
  * plus per-restart wall time around the engine numbers (stream start
  * and teardown are OUTSIDE durationMs — their share is
  * `wall − triggerExecution`).
  *
  * Representatives:
  *  - restart-per-slice window aggregation (q_agg_interval_stream's
  *    shape): 5 slices + sentinel, one AvailableNow restart each;
  *  - continuous MinHash gate (q_dedup_stream's shape): one stream,
  *    maxFilesPerTrigger=1.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.StreamDurationProbe"
  */
object StreamDurationProbe {

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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val S1 = 1704240000L
    val E1 = 1706400000L
    val bounds = Seq(S1, 1704672000L, 1705104000L, 1705536000L, 1705968000L, E1 + 1)

    // warm-up: run the whole restart cycle once untimed so JIT noise
    // doesn't masquerade as engine cost in the reported run
    (0 until 2).foreach { round =>
      val label = if (round == 0) "warmup" else "measured"
      val real = EventsAsConditions.load(spark, sfDir).filter(
          col("timestamp") >= timestamp_seconds(lit(S1)) &&
          col("timestamp") <= timestamp_seconds(lit(E1)))
        .select("measurement_subject", "measurement_of", "measurement_number", "timestamp")
      val tmp = java.nio.file.Files.createTempDirectory(s"sdp_aggint_$round").toString
      try {
        def drain(tag: String): Unit = {
          val (_, wall) = time {
            val stream = spark.readStream.schema(real.schema).parquet(s"$tmp/input")
            val q = graft.queries.TimeseriesQueries.streamingIntervalStats(stream, intervalS = 86400)
              .writeStream.format("parquet")
              .option("path", s"$tmp/out")
              .outputMode("append")
              .option("checkpointLocation", s"$tmp/cp")
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
            if (round > 0) {
              q.recentProgress.foreach { p =>
                val dm = p.durationMs
                println(s"""[$label $tag] batch=${p.batchId} rows=${p.numInputRows} durationMs=${dm}""")
              }
            }
          }
          if (round > 0) println(f"[$label $tag] restart wall = $wall%.2f s")
        }
        var i = 0
        bounds.sliding(2).foreach { case Seq(a, b) =>
          val (_, st) = time(
            real.filter(col("timestamp") >= timestamp_seconds(lit(a)) &&
                col("timestamp") < timestamp_seconds(lit(b)))
              .coalesce(1).write.mode("append").parquet(s"$tmp/input"))
          if (round > 0) println(f"[$label] stage slice $i = $st%.2f s")
          drain(s"slice$i")
          i += 1
        case _ => ()
        }
        Seq(("__sentinel__", "__sentinel__", 0.0, new java.sql.Timestamp(4102444800L * 1000L)))
          .toDF("measurement_subject", "measurement_of", "measurement_number", "timestamp")
          .coalesce(1).write.mode("append").parquet(s"$tmp/input")
        drain("sentinel")
      } finally graft.util.FsUtil.deleteRecursively(new java.io.File(tmp))
    }

    // continuous gate: MinHash dedup stream, 3 one-file batches
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val idxDocs = docs.filter(col("doc_id") % 2 === 0)
    graft.operators.Dedup.writeSignatureIndex(idxDocs, "sdp_sig_index")
    (0 until 2).foreach { round =>
      val label = if (round == 0) "warmup" else "measured"
      val tmp = java.nio.file.Files.createTempDirectory(s"sdp_dedup_$round").toString
      try {
        docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text", "source")
          .repartition(3).write.parquet(s"$tmp/input")
        val (_, wall) = time {
          val q = graft.streaming.DedupStream.start(spark, s"$tmp/input",
            "sdp_sig_index", idxDocs, s"$tmp/out", s"$tmp/cp",
            maxFilesPerTrigger = Some(1))
          q.awaitTermination()
          if (round > 0) q.recentProgress.foreach { p =>
            println(s"""[$label gate] batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}""")
          }
        }
        if (round > 0) println(f"[$label gate] stream wall = $wall%.2f s")
      } finally graft.util.FsUtil.deleteRecursively(new java.io.File(tmp))
    }
    spark.stop()
  }
}
