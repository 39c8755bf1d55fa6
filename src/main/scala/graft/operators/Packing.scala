package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Materialized training sequences — the second half of
    * [[assignSequences]]: each sequence's documents concatenated in
    * doc_id order into one training example, with its doc count and
    * token total. The heavy work stays in the distributed prefix sum;
    * materialization is one seq_id-keyed aggregation whose per-group
    * sort is bounded by docs-per-sequence (≈ budget / mean doc length),
    * never the corpus.
    */
  def materializeSequences(docs: DataFrame, budget: Long): DataFrame =
    assignSequences(docs, budget)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("seq_tokens"),
        // struct array sorts by leading field (doc_id) — deterministic
        // concat order, engine-replayable as string_agg(... ORDER BY)
        concat_ws(" ", transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
          x => x.getField("text"))).as("seq_text"))
      .orderBy("seq_id")

  /** Context-window chunking: split each document into fixed
    * `maxTokens`-token windows advancing by `maxTokens − overlap` —
    * the per-document sibling of [[assignSequences]] (which packs whole
    * docs ACROSS sequence boundaries, while this splits docs that exceed
    * one window). Chunk count = max(1, ⌈(n − overlap)/stride⌉), so every
    * document emits at least one chunk and every token is covered; all
    * boundary arithmetic is integer (`div`), bit-identical in any engine.
    *
    * Scale shape: map-only (split → explode of a per-doc chunk sequence
    * → slice), no shuffle, pipelines with any downstream tokenizer;
    * output size is corpus tokens × (1 + overlap/stride).
    */
  /** Length-bucketed batch assembly (sorted/bucketed batching, the
    * standard padding-minimization trick in sequence training): documents
    * land in a LENGTH BUCKET (`n_tokens div bucketWidth`), are shuffled
    * deterministically within it (salted-md5 order — same doc, same slot,
    * any partitioning), and consecutive runs of `batchSize` form batches.
    * Every batch holds lengths within one `bucketWidth`, so padding waste
    * per doc is < bucketWidth instead of < max-corpus-length.
    *
    * Scale shape (the [[Sampling.epochShuffle]] recipe): batches are
    * formed per (bucket, shard) with `shard` a hash of the doc key, so
    * the sequencing window partitions into `numShards` pieces per bucket
    * — no global sort, no single hot partition for the dominant length
    * range. batch_id is (bucket, shard, seq) packed into one BIGINT
    * (bucket·2³² + shard·2²⁰ + seq) — collision-free while a single
    * (bucket, shard) holds < 2²⁰ batches; size `numShards` so it does.
    */
  def lengthBucketedBatches(docs: DataFrame, batchSize: Int,
                            bucketWidth: Int, numShards: Int = 8,
                            key: String = "doc_id"): DataFrame = {
    require(batchSize > 0 && bucketWidth > 0 && numShards > 0)
    require(numShards < (1 << 12), "numShards must fit 12 bits")
    val base = docs
      .select(col(key), split(col("text"), " ").as("__w"))
      .select(col(key), size(col("__w")).cast("long").as("n_tokens"))
      .withColumn("len_bucket", expr(s"n_tokens div $bucketWidth"))
      .withColumn("__sk", Sampling.bucket(col(key), "batch"))
      .withColumn("shard", (col("__sk") % numShards).cast("int"))
    val w = Window.partitionBy("len_bucket", "shard")
      .orderBy(col("__sk"), col(key))
    base
      .withColumn("__rn", row_number().over(w).cast("long") - 1)
      .withColumn("__seq", expr(s"__rn div $batchSize"))
      .withColumn("batch_id",
        col("len_bucket") * expr("cast(4294967296 as bigint)") +
          col("shard").cast("long") * expr("cast(1048576 as bigint)") + col("__seq"))
      .select(col(key), col("n_tokens"), col("len_bucket"), col("shard"),
        col("batch_id"))
      .orderBy(col(key))
  }

  /** Fill-in-the-middle / span-corruption example construction (Bavarian
    * et al. 2022 FIM; Raffel et al. 2020 T5 span corruption): a
    * deterministic subset of eligible documents is split into
    * (prefix, middle, suffix) with the masked span drawn from the middle
    * third — the training-example transform an infilling-capable model's
    * data pipeline applies at scale.
    *
    * Determinism is the whole design: selection and span geometry come
    * from salted md5 buckets of doc_id ([[Sampling.bucket]] — the
    * split/downsample recipe), so the transform is reproducible across
    * runs, partitionings, AND engines (the oracle replays the same
    * arithmetic). `fimRate` is in bucket units of 1/10000. Map-only:
    * split + integer arithmetic + three array_join slices, no shuffle
    * until the output ORDER BY.
    */
  def fimExamples(docs: DataFrame, minTokens: Int = 12,
                  fimRate: Double = 0.5): DataFrame = {
    require(minTokens >= 3, "minTokens must be >= 3")
    require(fimRate > 0 && fimRate <= 1, "fimRate must be in (0, 1]")
    val threshold = math.round(fimRate * Sampling.BucketCount).toInt
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("n", size(col("w")))
      .withColumn("b0", Sampling.bucket(col("doc_id"), "fim"))
      .filter(col("n") >= minTokens && col("b0") < threshold)
      .withColumn("third", expr("n div 3"))
      .withColumn("a",
        col("third") + Sampling.bucket(col("doc_id"), "fimstart")
          % greatest(col("third"), lit(1)) + 1)
      .withColumn("l",
        Sampling.bucket(col("doc_id"), "fimlen")
          % greatest(col("third"), lit(1)) + 1)
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        expr("array_join(slice(w, 1, a - 1), ' ')").as("prefix"),
        expr("array_join(slice(w, a, l), ' ')").as("middle"),
        expr("array_join(slice(w, a + l, greatest(n - (a + l) + 1, 0)), ' ')")
          .as("suffix"))
      .orderBy("doc_id")
  }

  def chunkDocuments(docs: DataFrame, maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens, "overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("chunk_id", explode(expr(
        s"sequence(0, greatest(1L, (size(w) - $overlap + ${stride - 1}) div $stride) - 1)")))
      .select(col("doc_id"), col("chunk_id"),
        least(lit(maxTokens), size(col("w")) - col("chunk_id") * stride)
          .cast("long").as("n_tokens"),
        expr(s"array_join(slice(w, chunk_id * $stride + 1, $maxTokens), ' ')").as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }
}
