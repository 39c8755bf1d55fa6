package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dynamic-JSON payloads as Spark 4 `VariantType` — the SQL-queryable
  * alternative to pre-flattening (SURVEY §1.4): the reference's event
  * envelopes carry publisher-specific payloads with no fixed schema
  * (cf. `shared_code/json_converter.py` dispatching on shape), which the
  * ingest path handles with a Jackson flatMap. For ad-hoc analytics over
  * RAW envelopes, parsing to Variant keeps the full dynamic structure
  * addressable by path without committing to a schema:
  *
  *  - `parse_json` builds the Variant once (binary-encoded, shredded
  *    fields — far cheaper than repeated `get_json_object` string
  *    re-parses, and columnar-friendly at 100 TB);
  *  - `variant_get(v, path, type)` extracts typed fields; absent paths
  *    yield NULL (the analytic analogue of the converters' dead-letter
  *    drop, not an error);
  *  - `try_parse_json` maps malformed envelopes to NULL so one bad row
  *    cannot fail a scan — same contract as `try_to_timestamp` in the
  *    BMW stream.
  *
  * All three are built-in Catalyst expressions — no UDF, full codegen.
  */
object DynamicJson {

  /** Raw envelope strings → (variant, topic) — malformed rows keep a
    * NULL variant rather than failing the scan.
    */
  def parseEnvelopes(raw: DataFrame, rawCol: String = "raw"): DataFrame =
    raw.select(try_parse_json(col(rawCol)).as("v"))
      .withColumn("topic", variant_get(col("v"), "$.topic", "string"))

  /** Typed extraction through a string-embedded nested payload: the MQTT
    * envelope's `payload` field is itself a JSON STRING (the reference's
    * wire format), so it is extracted as string and parsed to a second
    * Variant for field access.
    */
  def payloadField(v: Column, path: String, dataType: String): Column =
    variant_get(try_parse_json(variant_get(v, "$.payload", "string")), path, dataType)
}
