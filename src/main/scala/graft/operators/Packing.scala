package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: assign documents (in deterministic
  * doc_id order) to fixed token-budget training sequences — the
  * concat-then-chunk shape used to build packed training batches. A
  * document's sequence is `floor(exclusive_prefix_sum(n_tokens) / budget)`,
  * i.e. sequences are filled greedily in corpus order and a document that
  * straddles a boundary belongs to the sequence where it starts.
  *
  * Scale design — a GLOBAL running sum without a global window: a
  * partitionless `Window.orderBy` would collapse the corpus into ONE task
  * (Spark's classic prefix-sum trap). Instead the classic two-phase
  * distributed prefix sum:
  *
  *  1. range-partition + sort by doc_id (the only shuffle);
  *  2. per-partition token totals — a tiny `numPartitions`-sized collect;
  *  3. per-partition start offsets broadcast back; each partition computes
  *     its local running sum + offset independently.
  *
  * Two passes over the sorted data, both fully parallel. The result is
  * independent of partitioning (range boundaries move, prefix sums don't).
  * This is one of the rare justified RDD drops (guide §custom-operators):
  * `mapPartitionsWithIndex` is genuine per-partition imperative logic with
  * no Catalyst equivalent that avoids the single-task window.
  */
object Packing {

  /** (doc_id, n_tokens, seq_id) for every document; `n_tokens` is the
    * whitespace token count ([[TextAnalysis.tokenCount]] convention).
    */
  def assignSequences(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val sorted = TextAnalysis.tokenCount(docs)
      .repartitionByRange(par, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long)]
    // both passes share the same lineage, so the range shuffle's map
    // stage runs once (shuffle files are reused); only the post-shuffle
    // sort re-runs — no cache to leak
    val rdd = sorted.rdd
    val totals = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(s += _._2)
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _).dropRight(1)
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bcOffsets.value(i)
      it.map { case (id, n) =>
        val start = acc
        acc += n
        (id, n, start / budget)
      }
    }.toDF("doc_id", "n_tokens", "seq_id")
      .orderBy("doc_id")
  }
}
