package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q_ingest_wire streaming topology to pin
  * the r5 bench regression. Scratch probe, not part of the library
  * surface.
  */
object WireProbe {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    System.err.println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.SparkEntry
    (1 to 2).foreach { rep =>
      System.err.println(s"--- rep $rep")
      val tmp = java.nio.file.Files.createTempDirectory("wireprobe").toString
      val env = graft.sources.EventsAsConditions.loadEvents(spark, sfDir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(format_string(
          """{"topic": "emon/emonTx4", "payload": "{\"P1\": %s, \"time\": %.6f}", "qos": 0, "retain": 0, "timestamp": 0}""",
          col("value"), (unix_micros(col("ts")) / 1000000.0)).as("raw"))
      time("write input text")(env.write.text(s"$tmp/input"))
      time("stream 1: convert→wire")(
        graft.streaming.IngestPipeline
          .startConvertToWire(spark, s"$tmp/input", s"$tmp/wire", s"$tmp/cp_convert")
          .awaitTermination())
      time("stream 2: wire→store")(
        graft.streaming.IngestPipeline
          .startWire(spark, s"$tmp/wire", s"$tmp/out", s"$tmp/cp_store")
          .awaitTermination())
      time("read+order+count")(
        spark.read.parquet(s"$tmp/out")
          .select(unix_micros(col("timestamp")).as("ts_us"))
          .orderBy("ts_us").count())
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    spark.stop()
  }
}
