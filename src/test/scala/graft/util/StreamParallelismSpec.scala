package graft.util

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Pins the size-derived stream parallelism policy (r15 optimization):
  * partitions = ceil(bytes / target) floored at 1, target = AQE's
  * advisory size unless `graft.stream.targetPartitionBytes` overrides,
  * `graft.stream.shufflePartitions` wins verbatim; and the derived
  * session observes the caller's runtime conf (a scoped setting like
  * the no-data-micro-batch disable must ride into the stream) while the
  * caller's own shuffle setting stays untouched.
  */
class StreamParallelismSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "7")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sizedPartitions: ceil(bytes/target) floored at 1, conf overrides honored") {
    spark.conf.set(StreamParallelism.TargetBytesKey, "100")
    assert(StreamParallelism.sizedPartitions(spark, 0L) == 1)
    assert(StreamParallelism.sizedPartitions(spark, 1L) == 1)
    assert(StreamParallelism.sizedPartitions(spark, 100L) == 1)
    assert(StreamParallelism.sizedPartitions(spark, 101L) == 2)
    assert(StreamParallelism.sizedPartitions(spark, 1000L) == 10)
    // explicit count wins verbatim
    spark.conf.set(StreamParallelism.ForcedKey, "5")
    assert(StreamParallelism.sizedPartitions(spark, 1000L) == 5)
    spark.conf.unset(StreamParallelism.ForcedKey)
    spark.conf.unset(StreamParallelism.TargetBytesKey)
    // default target = AQE advisory (64MB default): tiny input -> 1,
    // and a multi-advisory input scales with it
    assert(StreamParallelism.sizedPartitions(spark, 1L << 20) == 1)
    assert(StreamParallelism.sizedPartitions(spark, 200L << 20) == 4)
  }

  test("withSizedShufflePartitions: sized during the start body, restored after (incl. failure)") {
    import spark.implicits._
    val in = Files.createTempDirectory("sp_in").toString
    Seq(1L, 2L, 3L).toDF("v").coalesce(1).write.mode("append").parquet(in)
    val key = "spark.sql.shuffle.partitions"
    var inside = ""
    StreamParallelism.withSizedShufflePartitions(spark, in) {
      inside = spark.conf.get(key)
    }
    // tiny dir -> 1 partition while starting; caller's setting restored
    assert(inside == "1")
    assert(spark.conf.get(key) == "7")
    // restore also runs when the start body throws
    intercept[RuntimeException](
      StreamParallelism.withSizedShufflePartitions(spark, in) {
        throw new RuntimeException("boom")
      })
    assert(spark.conf.get(key) == "7")
    // absent dir sizes to the floor instead of throwing
    assert(StreamParallelism.sizedPartitions(
      spark, StreamParallelism.dirBytes(spark, in + "/nope")) == 1)
  }

  test("empty input dir keeps the session's provisioned setting (start-before-data)") {
    val key = "spark.sql.shuffle.partitions"
    val empty = Files.createTempDirectory("sp_empty").toString
    var inside = ""
    StreamParallelism.withSizedShufflePartitions(spark, empty) {
      inside = spark.conf.get(key)
    }
    // no sizing signal -> no latch: the provisioned width survives so a
    // long-lived checkpoint started before its data arrives is not
    // pinned to 1 partition forever
    assert(inside == "7")
    assert(spark.conf.get(key) == "7")
    // a forced override still applies verbatim, even on an empty dir
    spark.conf.set(StreamParallelism.ForcedKey, "3")
    try {
      StreamParallelism.withSizedShufflePartitions(spark, empty) {
        inside = spark.conf.get(key)
      }
      assert(inside == "3")
      assert(spark.conf.get(key) == "7")
    } finally spark.conf.unset(StreamParallelism.ForcedKey)
  }

  test("forced override is validated: non-numeric and non-positive fail naming the key") {
    try {
      spark.conf.set(StreamParallelism.ForcedKey, "lots")
      val e = intercept[IllegalArgumentException](
        StreamParallelism.sizedPartitions(spark, 1000L))
      assert(e.getMessage.contains(StreamParallelism.ForcedKey))
      spark.conf.set(StreamParallelism.ForcedKey, "0")
      val e2 = intercept[IllegalArgumentException](
        StreamParallelism.sizedPartitions(spark, 1000L))
      assert(e2.getMessage.contains(StreamParallelism.ForcedKey))
      spark.conf.set(StreamParallelism.ForcedKey, "-4")
      val e3 = intercept[IllegalArgumentException](
        StreamParallelism.sizedPartitions(spark, 1000L))
      assert(e3.getMessage.contains(StreamParallelism.ForcedKey))
    } finally spark.conf.unset(StreamParallelism.ForcedKey)
  }
}
