package graft.tools

import graft.sources.EventsAsConditions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures how much of a stateful micro-batch's addBatch time is
  * partition-count overhead (state-store instances + tiny shuffle/sink
  * tasks) vs data: the q_agg_interval_stream drain shape re-run at
  * several `spark.sql.shuffle.partitions` settings (state partition
  * count is fixed at FIRST query start from that conf, so each setting
  * uses a fresh checkpoint). Also re-times the MinHash gate the same
  * way. Diagnostic only; not referenced by any query row.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.StatePartitionProbe"
  */
object StatePartitionProbe {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
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

    val S1 = 1704240000L
    val E1 = 1706400000L
    val bounds = Seq(S1, 1704672000L, 1705104000L, 1705536000L, 1705968000L, E1 + 1)

    for (parts <- Seq(cpus.toInt, 8, 2, 1, cpus.toInt, 8, 2, 1); round <- 0 to 1) {
      val label = if (round == 0) s"warmup p=$parts" else s"measured p=$parts"
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val real = EventsAsConditions.load(spark, sfDir).filter(
          col("timestamp") >= timestamp_seconds(lit(S1)) &&
          col("timestamp") <= timestamp_seconds(lit(E1)))
        .select("measurement_subject", "measurement_of", "measurement_number", "timestamp")
      val tmp = java.nio.file.Files.createTempDirectory(s"spp_$parts").toString
      try {
        var drainTotal = 0.0
        def drain(): Unit = {
          val w = time {
            val stream = spark.readStream.schema(real.schema).parquet(s"$tmp/input")
            val q = graft.queries.TimeseriesQueries
              .streamingIntervalStats(stream, intervalS = 86400)
              .writeStream.format("parquet")
              .option("path", s"$tmp/out")
              .outputMode("append")
              .option("checkpointLocation", s"$tmp/cp")
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
          }
          drainTotal += w
        }
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        val stage = time(bounds.sliding(2).foreach { case Seq(a, b) =>
          real.filter(col("timestamp") >= timestamp_seconds(lit(a)) &&
              col("timestamp") < timestamp_seconds(lit(b)))
            .coalesce(1).write.mode("append").parquet(s"$tmp/input")
          drain()
        case _ => () })
        spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
        val nOut = spark.read.parquet(s"$tmp/out").count()
        if (round > 0)
          println(f"[spp aggint] parts=$parts%2d stage+drain=$stage%.2f s (drain=$drainTotal%.2f) out=$nOut")
      } finally graft.util.FsUtil.deleteRecursively(new java.io.File(tmp))
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus)

    // MinHash gate at each partition count (foreachBatch: AQE applies to
    // the inner batch jobs; this isolates how much the conf still matters)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val idxDocs = docs.filter(col("doc_id") % 2 === 0)
    graft.operators.Dedup.writeSignatureIndex(idxDocs, "spp_sig_index")
    for (parts <- Seq(cpus.toInt, 1, cpus.toInt, 1); round <- 0 to 1) {
      // the gate wraps its own start in withSizedShufflePartitions, which
      // would override a raw shuffle-partitions set from the input size —
      // the FORCED key is the knob that actually reaches the stream
      spark.conf.set(graft.util.StreamParallelism.ForcedKey, parts.toString)
      val tmp = java.nio.file.Files.createTempDirectory(s"spp_gate_$parts").toString
      try {
        docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text", "source")
          .repartition(3).write.parquet(s"$tmp/input")
        val w = time {
          val q = graft.streaming.DedupStream.start(spark, s"$tmp/input",
            "spp_sig_index", idxDocs, s"$tmp/out", s"$tmp/cp",
            maxFilesPerTrigger = Some(1))
          q.awaitTermination()
        }
        if (round > 0) println(f"[spp gate] parts=$parts%2d stream=$w%.2f s")
      } finally graft.util.FsUtil.deleteRecursively(new java.io.File(tmp))
    }
    spark.conf.unset(graft.util.StreamParallelism.ForcedKey)
    spark.stop()
  }
}
