package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the composition the individual
  * operators exist for:
  *
  *  1. exact dedup: keep the min-doc_id representative per content hash;
  *  2. near-dup removal: from the Jaccard similarity join, drop the
  *     larger-id side of every pair ≥ threshold (chains collapse to their
  *     minimal element in one pass because every non-minimal member pairs
  *     with something smaller);
  *  3. quality floor + language filter.
  *
  * `nearDupPairs` is pluggable; the DEFAULT is the scale path,
  * [[Dedup.minhashPairs]] (banded LSH candidates + exact Jaccard
  * verification) — candidate-generation cost instead of the exact
  * inverted-index join's Σdf² blowup on hot shingles. The DuckDB oracle
  * computes the exact join, so the contract hash-match doubles as an
  * EMPIRICAL recall check for this corpus and seed set — not a proof:
  * per-pair recall at j=0.8 (bands=16, rows=4) is ~0.9998, so a
  * near-threshold pair can in principle be missed at larger scale
  * factors (re-validate per SF). Inject [[Dedup.jaccardPairs]] to force
  * the exact tier when recall 1 is required.
  */
object CorpusCuration {

  def curate(docs: DataFrame,
             jaccardThreshold: Double = 0.8,
             minQuality: Double = 0.3,
             langs: Set[String] = Set("en"),
             nearDupPairs: Option[DataFrame] = None): DataFrame = {
    val exactKeep = Dedup.exact(docs) // (doc_id) min-id per content hash
    val pairs = nearDupPairs.getOrElse(Dedup.minhashPairs(docs, 3, threshold = jaccardThreshold))
    val nearDrop = pairs.select(col("doc_b").as("doc_id")).distinct()
    // quality + language from one text-stats pass (the per-doc tokenize is
    // the dominant cost; TextAnalysis.scores shares it)
    val scores = TextAnalysis.scores(docs)
    exactKeep
      .join(nearDrop, Seq("doc_id"), "left_anti")
      .join(scores, "doc_id")
      .filter(col("quality") >= minQuality && col("lang_pred").isin(langs.toSeq: _*))
      .select(col("doc_id"), col("quality"), col("lang_pred"))
      .orderBy("doc_id")
  }
}
