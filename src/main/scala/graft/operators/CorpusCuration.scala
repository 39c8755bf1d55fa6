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
  * `nearDupPairs` is pluggable: the exact inverted-index join is the
  * oracle-checked default; at 100 TB swap in [[Dedup.minhashPairs]] — the
  * LSH path returns the same pairs wherever its recall holds (tested
  * equal on this corpus), at candidate-generation cost instead of full
  * index-join cost.
  */
object CorpusCuration {

  def curate(docs: DataFrame,
             jaccardThreshold: Double = 0.8,
             minQuality: Double = 0.3,
             langs: Set[String] = Set("en"),
             nearDupPairs: Option[DataFrame] = None): DataFrame = {
    val exactKeep = Dedup.exact(docs) // (doc_id) min-id per content hash
    val pairs = nearDupPairs.getOrElse(Dedup.jaccardPairs(docs, 3, jaccardThreshold))
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
