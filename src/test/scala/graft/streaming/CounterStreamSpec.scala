package graft.streaming

import graft.queries.TimeseriesQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** CounterStream: the per-subject (last_t, last_c) carry must bridge
  * micro-batch boundaries so the pair stream equals the batch
  * [[TimeseriesQueries.counterToRate]] — including a reset that falls
  * exactly ON a batch boundary, and state that survives a query restart
  * (each run() below is a fresh query resumed from the checkpoint).
  */
class CounterStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val T0 = 1704240000L

  private def rows(data: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    data.map { case (off, subj, v) =>
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(T0 + off)),
        subj, "m", Option(v), Option.empty[String]) }
      .toDF("timestamp", "measurement_subject", "measurement_of",
        "measurement_number", "measurement_string")
  }

  test("batch-boundary bridge, boundary reset, restart survival") {
    // batch 1 ends 300.0; batch 2 opens 100.0 — a RESET whose pair spans
    // the boundary and must come from carried state, not batch data
    val b1 = Seq((0L, "s1", 100.0), (60L, "s1", 300.0), (0L, "s2", 50.0))
    val b2 = Seq((120L, "s1", 100.0), (180L, "s1", 400.0), (60L, "s2", 70.0))
    val tmp = java.nio.file.Files.createTempDirectory("counter_stream").toString
    try {
      val schema = rows(b1).schema
      def run(): Unit = {
        val q = CounterStream.deltas(
            spark.readStream.schema(schema).parquet(s"$tmp/in"), "m")
          .writeStream.format("parquet")
          .option("path", s"$tmp/out")
          .outputMode("append")
          .option("checkpointLocation", s"$tmp/cp")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      rows(b1).coalesce(1).write.mode("append").parquet(s"$tmp/in"); run()
      rows(b2).coalesce(1).write.mode("append").parquet(s"$tmp/in"); run()
      val got = spark.read.parquet(s"$tmp/out")
        .orderBy("measurement_subject", "t_start_us").collect()
        .map(r => (r.getString(2), r.getLong(0), r.getLong(3), r.getBoolean(5)))
      val expect = TimeseriesQueries.counterToRate(rows(b1 ++ b2), "m", T0, T0 + 600)
        .collect()
        .map(r => (r.getString(2), r.getLong(0), r.getLong(3), r.getBoolean(5)))
      assert(got.toSeq == expect.toSeq, s"got ${got.toSeq}\nexp ${expect.toSeq}")
      // the boundary reset specifically: s1 120 s pair must be a reset
      // with dv 0 (the carried 300.0 → 100.0)
      assert(got.exists { case (s, t, dv, r) =>
        s == "s1" && t == (T0 + 60) * 1000000L && dv == 0L && r })
    } finally {
      graft.util.FsUtil.deleteRecursively(new java.io.File(tmp))
    }
  }
}
