package graft

import graft.sources.{ConditionsTable, EventsAsConditions}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ConditionsViewSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val S = 1704240000L
  private val E = 1706400000L

  test("every reference db function is callable by name and returns rows") {
    val v = new ConditionsView(EventsAsConditions.load(spark, "/root/testdata/sf0.001"))
    assert(v.getAggregatedData("user_3", "click", S, E, 50).count() > 0)
    assert(v.getAggregatedDataByInterval("user_3", "click", S, E, 86400).count() > 0)
    assert(v.getAggregatedDataByDay("user_3", "click", S, E).count() > 0)
    assert(v.getMostFrequentValueByTimeInterval("user_3", "click", S, E).count() > 0)
    assert(v.getSampledData(spark, "user_3", "click", S, E, 20).count() > 0)
    assert(v.getSampledDataWithTimeWeight("user_3", "click", S, E, "linear", 50).count() > 0)
    assert(v.getSampledDataWithTimeWeight("user_3", "click", S, E, "locf", 50).count() > 0)
    assert(v.getUniqueMeasurementSubjects(S, E, "click").count() == 10)
    assert(v.filterUnchangedRows("user_3", "click", S, E).count() > 0)
    assert(v.formatTimeIntervals("user_3", "click", S, E, clockS = E).count() > 0)
    intercept[IllegalArgumentException](
      v.getSampledDataWithTimeWeight("user_3", "click", S, E, "nope", 50))
  }

  test("dead letters: malformed and unknown-publisher events, not filtered topics") {
    import spark.implicits._
    val raw = spark.createDataset(Seq(
      "not json at all",
      """{"topic":"unknownpub/x","payload":"{}"}""",
      """{"no":"topic"}""",
      // filtered (uninteresting topic) — NOT a dead letter
      """{"topic": "homie/hubitat/$implementation/heartbeat", "payload": "1747,none", "timestamp": "2022-12-26T13:44:54.724"}""",
      // valid homie mode event — not a dead letter
      """{"topic": "homie/hubitat/hub/mode", "payload": "Home", "timestamp": 1672174513.6086972}"""))
    val bad = ConditionsTable.deadLetters(spark, raw).collect().toSet
    assert(bad == Set("not json at all",
      """{"topic":"unknownpub/x","payload":"{}"}""",
      """{"no":"topic"}"""))
  }
}
