package graft.streaming

import graft.operators.QualityModels
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming quality gate: incoming documents are scored per micro-batch
  * against a PERSISTED Naive-Bayes model ([[QualityModels.writeNbModel]])
  * and only above-threshold docs reach the output store — the model-based
  * sibling of the dedup gates ([[DedupStream]]) and the fifth external
  * state family to gate streams (MinHash buckets, SimHash segments, IVF
  * lists, line claims, NB weights).
  *
  * State is the vocab-sized model table, never a Spark state store: the
  * per-batch cost is one explode + weight join + per-doc sum, independent
  * of how much has streamed before, and a model retrain (overwrite the
  * table) upgrades the gate between batches with no checkpoint surgery.
  * Scoring inside `foreachBatch` runs the exact batch scorer
  * ([[QualityModels.scoreAgainstModel]]), so streaming and batch cannot
  * drift. Parquet appends are at-least-once on batch replay, as with the
  * other gates.
  */
object QualityStream {

  def start(spark: SparkSession, inputDir: String, modelTable: String,
            outputDir: String, checkpointDir: String,
            threshold: Double = 0.0,
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
        val passed = QualityModels.scoreAgainstModel(batch.toDF(), modelTable)
          .filter(col("score") > threshold)
          .select("doc_id")
        batch.toDF().join(passed, Seq("doc_id"), "left_semi")
          .write.mode("append").parquet(outputDir)
      }
      .start()
    }
  }
}
