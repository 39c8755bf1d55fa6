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
}
