package graft.streaming

import graft.sources.ConditionsTable
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** A7 JDBC conditions sink exercised against an embedded Derby database
  * (ships with Spark) — no external TimescaleDB is available in this
  * environment, but the writer path (`df.write.jdbc` append with table
  * auto-create) is database-agnostic.
  */
class JdbcSinkSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("jdbcBatchWriter round-trips conditions rows through embedded Derby") {
    import spark.implicits._
    val url = s"jdbc:derby:${Files.createTempDirectory("derby")}/conditions_db;create=true"
    val props = new java.util.Properties()

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val corpus = mapper.readTree(getClass.getResourceAsStream("/golden_test_data.json"))
    import scala.jdk.CollectionConverters._
    val bodies = corpus.fields.asScala
      .filter(_.getValue.get("type").asText == "EventHubEvent")
      .map(_.getValue.get("properties").get("body").asText).toVector

    val records = ConditionsTable.normalize(spark, spark.createDataset(bodies))
    // the date column is a parquet partitioning concern; the DB table is
    // the reference's conditions shape
    val storage = ConditionsTable.toStorage(records).drop("date")

    IngestPipeline.jdbcBatchWriter(url, "conditions", props)(storage, 0L)
    // second batch appends (the per-micro-batch path)
    IngestPipeline.jdbcBatchWriter(url, "conditions", props)(storage.limit(5), 1L)

    // assert client-side: Derby maps strings to CLOB, which its SQL layer
    // cannot compare, so no pushed-down string predicates here
    val back = spark.read.jdbc(url, "conditions", props).collect()
    assert(back.length == 36 + 5)
    val glow = back.filter(r =>
      r.getAs[String]("measurement_of") == "import_cumulative" &&
      r.getAs[String]("measurement_subject") == "electricitymeter")
    assert(glow.map(_.getAs[Double]("measurement_number")).contains(5071.527))
    // timestamp fidelity through the database round-trip
    val ts = back.find(_.getAs[String]("measurement_of") == "mode").get
      .getAs[java.sql.Timestamp]("timestamp").toInstant.toString
    assert(ts == "2022-12-27T20:55:13.608697Z")
  }
}
