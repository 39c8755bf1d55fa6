package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Corpus-drop ingestion: JSONL (the lingua franca of crawl deliveries)
  * read with an EXPLICIT schema and corrupt-record routing — the
  * reference's parse-and-route contract (malformed events must never
  * poison a batch, `shared_code/convert.py`'s drop-on-error)
  * applied to document corpora.
  *
  * PERMISSIVE mode parses every line it can and lands the raw text of
  * every line it cannot in [[CorruptCol]]; [[readJsonlRouted]] splits the
  * two — good rows with the declared schema, bad rows as a dead-letter
  * frame carrying the offending line verbatim (triage-able, re-playable).
  * An explicit schema is non-negotiable at 100 TB: schema inference is a
  * full extra pass over the data, and a drifting inferred schema breaks
  * downstream plans silently.
  *
  * Note Spark's corrupt-column restriction: a query may not reference
  * only the internal corrupt column of a raw JSON relation (the parser
  * skips corrupt bookkeeping when no data column is needed), so the
  * parsed frame is cached before splitting — the fix the restriction's
  * own error message prescribes. A corpus drop is a bounded batch;
  * at 100 TB stage the parsed frame as a table instead of a cache.
  */
object CorpusIngest {

  val CorruptCol = "_corrupt_record"

  /** The documents-table schema, the default corpus-drop contract. */
  def documentsSchema: StructType = new StructType()
    .add("doc_id", "long").add("text", "string")
    .add("lang", "string").add("source", "string")

  /** (good, deadLetters): good rows carry `schema`, dead letters carry
    * the raw offending line. One scan feeds both (Spark shares the file
    * listing; at scale persist the parsed frame if both sides are
    * consumed eagerly).
    */
  def readJsonlRouted(spark: SparkSession, path: String,
                      schema: StructType = documentsSchema): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add(CorruptCol, StringType)
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    val good = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (good, bad)
  }
}
