package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with a held-out evaluation corpus, so eval answers can be
  * excised from the training set before training.
  *
  * Shape at scale: the benchmark side is small (eval suites are KBs-MBs
  * against a 100 TB corpus), so its distinct n-gram set broadcasts; the
  * corpus side streams through a narrow shingle flatMap and a broadcast
  * inner join — no shuffle touches corpus-proportional data until the
  * per-doc aggregate, whose input is bounded by the number of
  * contaminated (doc, shared-ngram) rows, not the corpus size.
  * For a benchmark too large to broadcast, pass
  * `broadcastBenchmark = false` to get a shuffle join on the n-gram —
  * still candidate-bounded, never all-pairs.
  */
object Decontamination {

  /** Documents in `corpus` sharing ≥1 word n-gram with `benchmark`:
    * (doc_id, n_shared = distinct shared n-grams). `n` is the shingle
    * order — real pipelines use 8-13-gram exact-substring collision.
    * Shingling reuses [[Dedup.shingles]] (same tokenization and distinct
    * semantics); to actually share one shingle scan with a dedup pass,
    * call both with the SAME `n` — the defaults differ (8 here vs
    * Dedup's 3) because the tasks' sweet spots differ.
    */
  def contaminated(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
                   broadcastBenchmark: Boolean = true): DataFrame = {
    val corpusShingles = Dedup.shingles(corpus, n).select("doc_id", "s")
    val benchShingles = Dedup.shingles(benchmark, n).select("s").distinct()
    val benchSide = if (broadcastBenchmark) broadcast(benchShingles) else benchShingles
    corpusShingles
      .join(benchSide, "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared")) // shingles() already emits per-doc distinct
      .orderBy("doc_id")
  }

  /** The AUDIT face of [[contaminated]]: per (corpus doc, benchmark doc)
    * pair, how many distinct n-grams they share and one example n-gram
    * (min — deterministic) — the evidence trail a leakage review reads
    * ("which eval items does this training doc leak, and what does the
    * overlap look like") rather than the drop-list the filter consumes.
    * Same broadcast-benchmark join as [[contaminated]], with the
    * benchmark's doc ids kept through the join; pair fan-out is bounded
    * by true contamination (a corpus n-gram joins only the bench docs
    * that contain it).
    */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
                          broadcastBenchmark: Boolean = true): DataFrame = {
    val corpusShingles = Dedup.shingles(corpus, n).select("doc_id", "s")
    val benchShingles = Dedup.shingles(benchmark, n)
      .select(col("doc_id").as("bench_id"), col("s")).distinct()
    val benchSide = if (broadcastBenchmark) broadcast(benchShingles) else benchShingles
    corpusShingles
      .join(benchSide, "s")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"), min("s").as("example_ngram"))
      .orderBy("doc_id", "bench_id")
  }

  /** [[contaminated]] with a broadcast BLOOM pre-filter — the 100 TB
    * tier for a benchmark set too large to broadcast as exact strings.
    * A Bloom filter over the benchmark n-grams is ~`-1.44·log2(fpp)`
    * bits per element (≈10 bits at fpp 0.01) vs ~10²-10³ BYTES per
    * broadcast string — two to three orders of magnitude less to ship —
    * and the corpus side drops every non-matching n-gram in the map
    * stage. Bloom filters have NO false negatives, so the pre-filter
    * never loses a contaminated row; the surviving trickle
    * (≈ fpp · |corpus n-grams| + true hits) goes through the exact
    * SHUFFLE join to discard false positives. Results are therefore
    * EXACTLY [[contaminated]]'s — the contract query shares its oracle —
    * while no corpus-proportional data is broadcast or shuffled.
    */
  /** Call-time cost and state: building the filter runs TWO
    * benchmark-proportional jobs up front (the sizing count + the bloom
    * aggregate); the returned plan is LAZY like every other operator
    * here, and the broadcast bloom is its ONLY captured state. The
    * confirmation join recomputes the benchmark shingles from source
    * lineage when the caller acts — benchmark-proportional, negligible
    * next to the corpus scan, and fully recoverable after executor loss
    * (an earlier formulation localCheckpoint'ed the result eagerly,
    * which pinned it in executor block storage with NO lineage — the
    * wrong durability trade for a 100 TB tier).
    */
  def contaminatedBloom(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
                        fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val spark = corpus.sparkSession
    import spark.implicits._
    val benchShingles = Dedup.shingles(benchmark, n).select("s").distinct()
    // expected-item count for sizing: one benchmark-proportional job.
    // Empty benchmark short-circuits — nothing can be contaminated, and
    // stat.bloomFilter NPEs on an empty frame (null aggregate buffer)
    val expected = benchShingles.count()
    if (expected == 0) return Seq.empty[(Long, Long)].toDF("doc_id", "n_shared")
    val bloom = benchShingles.stat.bloomFilter("s", expected, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => bc.value.mightContainString(s))
    Dedup.shingles(corpus, n).select("doc_id", "s")
      .filter(mightContain(col("s")))
      // exact confirmation on the candidate trickle: shuffle join, NOT
      // broadcast — the whole point is the benchmark may be too big to
      // broadcast exactly
      .join(benchShingles, "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  /** SEMANTIC decontamination: drop corpus items whose embedding is
    * within cosine `threshold` of ANY benchmark embedding — the
    * paraphrase-contamination tier the n-gram methods can't see (an eval
    * answer reworded shares no 8-gram but keeps its embedding
    * neighborhood). Complements [[contaminated]] the way SemDeDup
    * complements exact dedup.
    *
    * Exact tier: the packed block-rectangle kernel
    * ([[Ann.neardupPairsIncremental]] — corpus blocks × benchmark
    * blocks; benchmark side is eval-suite-sized, so cells ≈ corpus
    * blocks), then an anti-join keeps the clean ids. No driver-side
    * data, no all-pairs within the corpus.
    */
  def semantic(corpus: DataFrame, benchmark: DataFrame,
               threshold: Double): DataFrame =
    corpus.select("vec_id").join(
      Ann.neardupPairsIncremental(corpus, benchmark, threshold)
        .select(col("id_new").as("vec_id")).distinct(),
      Seq("vec_id"), "left_anti")
      .orderBy("vec_id")

  /** [[semantic]] served from a persisted IVF index over the BENCHMARK
    * ([[Ann.writeIvfIndex]]) — the 100 TB tier: the corpus probes only
    * `nProbe` benchmark lists per vector instead of the full benchmark;
    * at `nProbe = nlist` the result is exact and shares [[semantic]]'s
    * oracle. The benchmark index is built once per eval-suite release
    * and reused across every corpus snapshot.
    */
  def semanticAgainstIndex(corpus: DataFrame, indexTable: String,
                           threshold: Double, nProbe: Int): DataFrame =
    corpus.select("vec_id").join(
      Ann.neardupAgainstIvfIndex(corpus, indexTable, threshold, nProbe)
        .select(col("id_new").as("vec_id")).distinct(),
      Seq("vec_id"), "left_anti")
      .orderBy("vec_id")
}
