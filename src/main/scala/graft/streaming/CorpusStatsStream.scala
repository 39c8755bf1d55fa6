package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus statistics: each micro-batch of documents appends its
  * own vocabulary partials (batch-local hash agg) to a persisted
  * [[TextAnalysis.writeVocabIndex]] table — continuously-maintained corpus
  * stats with NO Spark state store: the "state" is the mergeable index
  * table, per-batch cost ∝ batch size, and any reader can serve the
  * current vocabulary mid-stream with [[TextAnalysis.vocabFromIndex]]
  * (counts are only ever additive, so a concurrent read is simply a
  * slightly-stale snapshot).
  *
  * Appends accumulate one small file set per batch — the classic
  * small-file problem; [[TextAnalysis.compactVocabIndex]] folds the
  * partials back to one row per token, the
  * [[graft.sources.ConditionsTable.compact]] hygiene applied to the
  * stats store. At-least-once on batch replay, as with the other gates —
  * counts are NOT idempotent under replay, so production sinks should
  * stage per-batch partials keyed by batchId and merge exactly-once.
  */
object CorpusStatsStream {

  def start(spark: SparkSession, inputDir: String, indexTable: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val schema = spark.read.parquet(inputDir).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    // stream shuffle/state partitions sized from the input at start
    // (scoped set around .start(); see StreamParallelism)
    graft.util.StreamParallelism.withSizedShufflePartitions(spark, inputDir) {
    reader.parquet(inputDir)
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        TextAnalysis.appendToVocabIndex(batch.toDF(), indexTable)
      }
      .start()
    }
  }
}
