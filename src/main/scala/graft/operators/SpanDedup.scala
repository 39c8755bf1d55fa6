package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-substring detection — the character-level complement of
  * the document-level dedup tiers (the public technique: Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better", which
  * removes any substring of ≥50 tokens appearing more than once; their
  * suffix-array machinery becomes a rolling-window group-by here, the
  * shape that distributes).
  *
  * A length-L character window that occurs ≥2 times anywhere in the
  * corpus (across documents or within one) is "duplicated"; per document,
  * overlapping/adjacent duplicated windows merge into MAXIMAL spans — the
  * copied regions a span-level dedup pass would excise (boilerplate,
  * licenses, templated paragraphs).
  *
  * Scale shape: the window explosion is the honest cost — n−L+1 rows per
  * n-char document, each row (doc_id, pos, L-char window), so the shuffle
  * is ≈ L× the corpus bytes. That is the price of EXACT span detection;
  * the winnowing fingerprint tier ([[TextAnalysis]]) is the cheap
  * approximate front-end, and the right 100 TB topology is winnow first,
  * then run this operator only over the candidate partition. Within the
  * pass everything is bounded: one window hash-agg (map-side partials), a
  * semi join back, one per-document sort for the island merge. No
  * suffix array, no global sort, no driver state.
  */
object SpanDedup {

  /** Maximal duplicated spans: (doc_id, span_start, span_end, n_windows)
    * — 1-based inclusive character positions, `n_windows` = duplicated
    * windows merged into the span. Windows are compared as raw L-char
    * substrings (exact equality, no hash-collision caveat); two
    * duplicated windows at distance ≤ L chain into one span.
    */
  def duplicatedSpans(docs: DataFrame, minLen: Int): DataFrame = {
    require(minLen > 0, "minLen must be positive")
    val L = minLen
    val wins = docs
      .filter(char_length(col("text")) >= L)
      .select(col("doc_id"),
        explode(sequence(lit(1L), (char_length(col("text")) - L + 1).cast("long")))
          .as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos"),
        expr(s"substring(text, pos, $L)").as("win"))
    // duplicated-window filter as ONE count-over-window pass: the naive
    // groupBy + semi-join shape shuffles the exploded rows twice AND
    // recomputes the explosion on both join sides (measured 8.4 s → 3.4 s
    // at sf0.1 for this form). The per-window group a task buffers is
    // df(window) rows — the hot-boilerplate window is the bounded risk,
    // and the 100 TB answer is the same as for hot shingles: run the
    // winnow front-end first so this exact pass sees candidates, not the
    // raw crawl.
    val dupPos = wins
      .withColumn("c", count(lit(1)).over(Window.partitionBy("win")))
      .filter(col("c") >= 2)
      .select("doc_id", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    dupPos
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(w) <= L, 0).otherwise(1))
      .withColumn("island",
        sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(L.toLong - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
      .orderBy("doc_id", "span_start")
  }

  /** Excise given spans from the documents: characters covered by any
    * [span_start, span_end] range are removed (1-based inclusive, the
    * [[duplicatedSpans]] convention); documents with no spans pass
    * through unchanged. Span surgery is a per-document compiled kernel
    * over the collected span list — span counts per document are bounded
    * by doc length / L, so the collect_list is task-safe by construction.
    */
  def stripSpans(docs: DataFrame, spans: DataFrame): DataFrame = {
    val strip = udf { (text: String, ranges: Seq[org.apache.spark.sql.Row]) =>
      if (ranges == null || ranges.isEmpty) text
      else {
        val sorted = ranges.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        val sb = new StringBuilder
        var next = 1L // 1-based cursor
        sorted.foreach { case (s, e) =>
          if (s > next) sb.append(text.substring(next.toInt - 1, (s - 1).toInt))
          next = math.max(next, e + 1)
        }
        if (next <= text.length) sb.append(text.substring(next.toInt - 1))
        sb.toString
      }
    }
    val byDoc = spans.groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("ranges"))
    docs.join(byDoc, Seq("doc_id"), "left")
      .withColumn("text", strip(col("text"), col("ranges")))
      .drop("ranges")
  }
}
