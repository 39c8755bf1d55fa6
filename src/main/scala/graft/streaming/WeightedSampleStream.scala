package graft.streaming

import graft.operators.Sampling
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming weighted sampling without replacement over an unbounded
  * corpus — state is the persisted ≤k-row top-key table
  * ([[Sampling.writeWeightedSampleState]]), and each micro-batch folds
  * in via top-k-of-union ([[Sampling.mergeIntoWeightedSample]]): the
  * Efraimidis–Spirakis keys make "a weighted sample of everything seen
  * so far" a mergeable summary, so the sample is ALWAYS exactly what
  * the one-shot draw over the full history would return, at per-batch
  * cost ∝ the batch (history is never rescanned).
  */
object WeightedSampleStream {

  def start(spark: SparkSession, inputDir: String, stateTable: String,
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
        Sampling.mergeIntoWeightedSample(batch.toDF(), stateTable)
      }
      .start()
    }
  }
}
