package graft.streaming

import graft.convert.{Bmw, Converters}
import graft.model.TimeseriesRecord
import graft.sources.ConditionsTable
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming re-expression of the reference's ingest dataflow
  * (SURVEY §3.1/§3.2).
  *
  * Reference shape: Event Hub → convert (glow/homie/emon) → Event Hub →
  * TimescaleDB, and timer → BMW API → Event Hub → dedup-vs-Azure-Table →
  * convert → dual Event Hub sinks → TimescaleDB. Here each hub is a
  * pluggable streaming source/sink (file source stands in for Event Hub;
  * the transforms never know the difference), the two hops fuse into one
  * streaming query (documented difference: no replayable intermediate
  * topic — checkpointing provides replay instead), and the Azure-Table
  * check-then-act dedup becomes `dropDuplicatesWithinWatermark` over
  * checkpointed state (at-most-once per key INTO the pipeline — stronger
  * than the reference, whose emit-then-store-id ordering can duplicate on
  * crash, `shared_code/bmw_to_timescale.py:28-37`). Sink-side,
  * `foreachBatch` parquet appends are at-least-once on batch replay, like
  * any non-transactional multi-sink write; an idempotent or transactional
  * sink upgrades the end-to-end guarantee.
  */
object IngestPipeline {

  /** Where a pipeline stage reads raw text events from (and, for the
    * wire hop, writes them to). The reference consumes Azure Event Hubs
    * (`json_to_timeseries/function.json:5-14`); Event Hubs exposes a
    * Kafka-compatible endpoint, so the DEPLOYABLE branch is Spark's
    * built-in `format("kafka")` source/sink with the message payload in
    * `value` — selected purely by config, no code edits. [[Files]] is
    * the hermetic default every test, oracle row and bench row runs
    * (this container has no broker; the transforms never know the
    * difference, which is the point of the seam).
    */
  sealed trait SourceConfig
  object SourceConfig {
    /** One JSON event per line under `dir` (text files). */
    final case class Files(dir: String) extends SourceConfig
    /** A Kafka(-compatible) topic; `options` passes through extra
      * `kafka.`-prefixed client settings (e.g. the SASL jaas config an
      * Event Hubs connection string requires).
      */
    final case class Kafka(bootstrapServers: String, topic: String,
                           startingOffsets: String = "earliest",
                           options: Map[String, String] = Map.empty)
      extends SourceConfig
  }

  /** Reader options for the kafka branch — pure, so the translation is
    * spec-checkable without a broker or the kafka connector jar.
    */
  private[streaming] def kafkaSourceOptions(k: SourceConfig.Kafka): Map[String, String] =
    Map("kafka.bootstrap.servers" -> k.bootstrapServers,
      "subscribe" -> k.topic,
      "startingOffsets" -> k.startingOffsets) ++ k.options

  /** Writer options for the kafka branch. */
  private[streaming] def kafkaSinkOptions(k: SourceConfig.Kafka): Map[String, String] =
    Map("kafka.bootstrap.servers" -> k.bootstrapServers,
      "topic" -> k.topic) ++ k.options

  /** The raw-text stream behind a [[SourceConfig]]: file lines, or the
    * kafka record `value` cast to string (the Event Hub payload).
    */
  private[streaming] def readText(spark: SparkSession, src: SourceConfig): Dataset[String] = {
    import spark.implicits._
    src match {
      case SourceConfig.Files(dir) => spark.readStream.textFile(dir)
      case k: SourceConfig.Kafka =>
        spark.readStream.format("kafka").options(kafkaSourceOptions(k))
          .load().select(col("value").cast("string")).as[String]
    }
  }

  /** Normalize a (streaming or batch) Dataset of raw event-hub payloads —
    * the exact batch code path ([[ConditionsTable.normalize]]), so golden
    * tests cover the streaming transform too.
    */
  def normalize(raw: Dataset[String]): Dataset[TimeseriesRecord] =
    ConditionsTable.normalize(raw.sparkSession, raw)

  /** MQTT-side pipeline (A1/A5/A7): text-file source (one JSON event per
    * line) → normalize → date-partitioned parquet conditions sink.
    */
  def startMqtt(spark: SparkSession, inputDir: String, outputDir: String,
                checkpointDir: String,
                trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    startMqtt(spark, SourceConfig.Files(inputDir), outputDir, checkpointDir, trigger)

  /** [[startMqtt]] with a config-selected source — the kafka branch makes
    * the A1 parity deployable against a real Event Hubs Kafka endpoint
    * without code edits.
    */
  def startMqtt(spark: SparkSession, src: SourceConfig, outputDir: String,
                checkpointDir: String, trigger: Trigger): StreamingQuery = {
    val records = normalize(readText(spark, src))
    ConditionsTable.toStorage(records)
      // cluster each micro-batch by the partition column before the
      // partitioned write: files per batch ≈ #dates instead of
      // #tasks × #dates — the small-files cliff of partitioned sinks
      // (same pattern as the IVF index write; measured ~1.5 s of the
      // q_ingest_wire bench on the storage hop)
      .repartition(col("date"))
      .writeStream
      .partitionBy("date")
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outputDir)
      .start()
  }

  /** Convert stage as its OWN pipeline (the reference's two-function
    * topology, `json_to_timeseries` → hub → `timeseries_to_timescale`):
    * raw envelopes in, wire-record JSON out to a replayable intermediate
    * topic (file sink standing in for Event Hub — A5). Pair with
    * [[startWire]] for the storage hop.
    */
  def startConvertToWire(spark: SparkSession, inputDir: String, wireDir: String,
                         checkpointDir: String,
                         trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    startConvertToWire(spark, SourceConfig.Files(inputDir),
      SourceConfig.Files(wireDir), checkpointDir, trigger)

  /** [[startConvertToWire]] with config-selected source AND wire sink —
    * with both on kafka this is the reference's hub → convert → hub hop
    * verbatim (A5's sink becomes a kafka `value` write).
    */
  def startConvertToWire(spark: SparkSession, src: SourceConfig, wire: SourceConfig,
                         checkpointDir: String, trigger: Trigger): StreamingQuery = {
    val out = graft.sources.WireRecords.emit(normalize(readText(spark, src)))
    val base = out.toDF("value").writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
    wire match {
      case SourceConfig.Files(dir) => base.format("text").option("path", dir).start()
      case k: SourceConfig.Kafka   => base.format("kafka").options(kafkaSinkOptions(k)).start()
    }
  }

  /** Storage stage as its OWN pipeline (`timeseries_to_timescale`): wire
    * messages (single record or v1 array envelope) → validate/decode →
    * date-partitioned parquet conditions store.
    */
  def startWire(spark: SparkSession, wireDir: String, outputDir: String,
                checkpointDir: String,
                trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    startWire(spark, SourceConfig.Files(wireDir), outputDir, checkpointDir, trigger)

  /** [[startWire]] with a config-selected wire source (A1's second hop). */
  def startWire(spark: SparkSession, wire: SourceConfig, outputDir: String,
                checkpointDir: String, trigger: Trigger): StreamingQuery =
    ConditionsTable.toStorage(
        graft.sources.WireRecords.decode(readText(spark, wire)))
      // see startMqtt: one shuffle per micro-batch buys files ≈ #dates
      .repartition(col("date"))
      .writeStream
      .partitionBy("date")
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outputDir)
      .start()

  /** BMW-side dedup + convert (A23/A21): extract the (vin, lastUpdatedAt)
    * key, drop duplicates within a 1-day watermark (the poll cadence is
    * 10 min, so a day of dedup state safely covers the reference's
    * semantics while keeping state bounded — the Azure Table grew forever),
    * then explode vehicle state into atomic records.
    */
  /** BMW `lastUpdatedAt` → TimestampType: trim sub-µs digits (BMW emits up
    * to 7 fractional digits; Spark parses ≤ 6), preserving ANY zone tail —
    * `Z`/`z` (uppercased — ANSI cast rejects lowercase), `+01:00`, `-0800`,
    * hour-only `+01`. An offset-suffixed timestamp used to miss the old
    * `(\.\d{6})\d*(Z?)$` pattern, keep its 7th digit, parse to null and be
    * silently dropped by the watermark. `try_to_timestamp` because under
    * ANSI semantics a plain cast THROWS on malformed input — one bad
    * record would kill the whole stream instead of dead-lettering.
    */
  def normalizedEventTime(lastUpdatedAt: Column): Column =
    try_to_timestamp(translate(regexp_replace(
      lastUpdatedAt, "(\\.\\d{6})\\d*([Zz]|[+-]\\d{2}(?::?\\d{2})?)?$", "$1$2"),
      "z", "Z"))

  def bmwDeduped(raw: Dataset[String]): Dataset[TimeseriesRecord] = {
    import raw.sparkSession.implicits._
    val keyed = raw
      .select(col("value"),
        get_json_object(col("value"), "$.vin").as("vin"),
        get_json_object(col("value"), "$.state.lastUpdatedAt").as("last_updated_at"))
      .filter(col("vin").isNotNull && col("last_updated_at").isNotNull)
      .withColumn("event_time", normalizedEventTime(col("last_updated_at")))
      .withWatermark("event_time", "1 day")
      .dropDuplicatesWithinWatermark("vin", "last_updated_at")
    keyed.select(col("value")).as[String]
      .flatMap(s => Bmw.convertMessage(s).getOrElse(Vector.empty))
  }

  /** BMW pipeline with the reference's dual-sink fan-out (A6): every
    * micro-batch lands in the conditions store AND a monitor copy.
    * `foreachBatch` is the Spark idiom for multi-sink writes.
    */
  def startBmw(spark: SparkSession, inputDir: String, outputDir: String,
               monitorDir: String, checkpointDir: String,
               trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    startBmw(spark, SourceConfig.Files(inputDir), outputDir, monitorDir,
      checkpointDir, trigger)

  /** [[startBmw]] with a config-selected source. */
  def startBmw(spark: SparkSession, src: SourceConfig, outputDir: String,
               monitorDir: String, checkpointDir: String,
               trigger: Trigger): StreamingQuery = {
    bmwDeduped(readText(spark, src))
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[TimeseriesRecord], _: Long) =>
        val storage = ConditionsTable.toStorage(batch).cache()
        try {
          storage.write.mode("append").partitionBy("date").parquet(outputDir)
          storage.write.mode("append").parquet(monitorDir)
        } finally storage.unpersist()
      }
      .start()
  }

  /** JDBC conditions sink (A7) for parity mode against a real
    * TimescaleDB: per-batch batched inserts replace the reference's
    * row-at-a-time psycopg INSERT loop (`shared_code/timescale.py:98-124`).
    * No TimescaleDB exists in this environment; the writer path is
    * round-trip-tested against embedded Derby (`JdbcSinkSpec`).
    */
  def jdbcBatchWriter(url: String, table: String,
                      props: java.util.Properties): (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      batch.write.mode("append").jdbc(url, table, props)
  }
}
