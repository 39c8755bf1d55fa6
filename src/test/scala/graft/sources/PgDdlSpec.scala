package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden test of the PG/TimescaleDB DDL emitter against the reference's
  * provisioning semantics (`db/create_table_and_roles.sql:35-59`): every
  * column with its exact PG type and nullability, all eight secondary
  * indexes with their access methods, the hypertable conversion — and
  * structural agreement with what the Spark sink actually writes
  * (`toStorage`'s columns must each have a typed DDL column).
  */
class PgDdlSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val ddl = ConditionsTable.pgDdl("conditions")

  // the reference's column → PG type/nullability mapping, verbatim
  private val RefColumns = Seq(
    "\"timestamp\"" -> "timestamp with time zone NOT NULL",
    "\"measurement_subject\"" -> "text NOT NULL",
    "\"measurement_number\"" -> "double precision",
    "\"measurement_of\"" -> "text NOT NULL",
    "\"measurement_string\"" -> "text",
    "\"correlation_id\"" -> "text",
    "\"measurement_bool\"" -> "boolean",
    "\"measurement_publisher\"" -> "text",
    "\"measurement_location\"" -> "geography(Point,4326)")

  test("every reference column appears with its exact type and nullability") {
    RefColumns.foreach { case (col, ty) =>
      val pat = (java.util.regex.Pattern.quote(col) + "\\s+" +
        java.util.regex.Pattern.quote(ty)).r
      assert(pat.findFirstIn(ddl).isDefined, s"missing or mistyped column $col $ty")
    }
    // sequence-backed unique id, reference naming convention
    assert(ddl.contains("CREATE SEQUENCE IF NOT EXISTS " +
      "conditions_measurement_unique_id_sequence START 1"))
    assert("measurement_unique_id\\s+bigint NOT NULL DEFAULT nextval\\('conditions_measurement_unique_id_sequence'\\)"
      .r.findFirstIn(ddl).isDefined, "unique id column must default to the sequence")
  }

  test("all eight secondary indexes with the reference's access methods, plus the hypertable") {
    val btree = Seq("correlation_id", "measurement_bool", "measurement_number",
      "measurement_string")
    val hash = Seq("measurement_of", "measurement_publisher", "measurement_subject")
    btree.foreach(c => assert(ddl.contains(
      s"CREATE INDEX IF NOT EXISTS conditions_${c}_idx ON conditions ($c);"), c))
    hash.foreach(c => assert(ddl.contains(
      s"CREATE INDEX IF NOT EXISTS conditions_${c}_idx ON conditions USING hash ($c);"), c))
    assert(ddl.contains(
      "CREATE INDEX IF NOT EXISTS conditions_timestamp_idx ON conditions (\"timestamp\" DESC);"),
      "timestamp index must be descending (dashboards read the recent end)")
    // if_not_exists keeps the WHOLE script re-runnable — every other
    // statement already guards with IF NOT EXISTS, and a resume after a
    // mid-script failure would otherwise abort on 'already a hypertable'
    assert(ddl.contains("SELECT create_hypertable('conditions', 'timestamp', if_not_exists => TRUE);"))
    assert(ddl.contains("CREATE EXTENSION IF NOT EXISTS timescaledb CASCADE;"))
    assert(ddl.contains("CREATE EXTENSION IF NOT EXISTS postgis CASCADE;"))
  }

  test("the DDL covers exactly what the Spark sink writes") {
    import spark.implicits._
    // a representative event through the real normalize → toStorage path
    val raw = Seq(
      """{"publisher":"glow","topic":"glow/ABC/SENSOR/electricitymeter","payload":{"electricitymeter":{"timestamp":"2024-01-03T00:00:00Z","energy":{"import":{"cumulative":1.5,"units":"kWh"}},"power":{"value":0.2,"units":"kW"}}}}""")
      .toDS()
    val storage = ConditionsTable.pgRows(ConditionsTable.toStorage(
      ConditionsTable.normalize(spark, raw, _ => Some("cid-1"))))
    // every PG-bound column must have a typed column in the DDL (the
    // DDL adds only the PG-side sequence id on top); pgRows drops the
    // parquet partition helper and the wire routing tag, like the
    // reference's insert path does
    val sinkCols = storage.columns.toSet
    sinkCols.foreach { c =>
      assert(ddl.contains(s""""$c""""), s"sink column $c missing from DDL")
    }
    val ddlCols = RefColumns.map(_._1.replace("\"", "")).toSet + "measurement_unique_id"
    assert(ddlCols -- sinkCols - "measurement_unique_id" == Set.empty,
      s"DDL declares columns the sink never writes: ${ddlCols -- sinkCols}")
  }

  test("table names are validated against injection-shaped input") {
    val ex = intercept[IllegalArgumentException](
      ConditionsTable.pgDdl("conditions; DROP TABLE x"))
    assert(ex.getMessage.contains("identifier"))
  }
}
