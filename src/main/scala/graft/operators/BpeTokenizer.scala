package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE (byte-pair-encoding) tokenizer training — the
  * Sennrich et al. 2016 (arXiv:1508.07909) algorithm re-expressed as
  * dataframe passes, the standard "learn the vocab from the corpus" step
  * in an LLM data pipeline.
  *
  * Algorithm shape (and why it scales): training never touches the corpus
  * more than once. The corpus collapses to a WORD HISTOGRAM (one hash
  * agg); every merge iteration then runs over the histogram — vocab-sized,
  * orders of magnitude smaller than 100 TB of text — as
  *
  *   pair counts (slice + zip + explode + hash agg, freq-weighted)
  *   → argmax pair (ONE row to the driver; ties (freq DESC, pair ASC))
  *   → apply merge (a map-side string `replace`, no shuffle)
  *
  * so k merges cost k histogram scans + k single-row collects. This is
  * exactly how reference BPE trainers work (word-frequency table, not raw
  * text), just with the per-iteration count distributed.
  *
  * Symbol encoding: a word's symbol sequence is a single string with each
  * symbol wrapped in angle brackets — "key" → `<k><e><y>`. A merge of
  * (a, b) is then the literal string replace `<a><b>` → `<ab>`, and
  * left-to-right non-overlapping `replace` semantics (identical in the
  * JVM, Spark SQL and DuckDB) are EXACTLY BPE's greedy merge order:
  * `<a><a><a><a>` merges to `<aa><aa>`, not `<aa><a><a>`. The wrapping
  * makes occurrences self-delimiting, so no merge can match across a
  * symbol boundary. Words are restricted to `^[a-z]+$` (the documented
  * pre-tokenizer contract — also what keeps the literal replace
  * metacharacter-free in both engines).
  */
object BpeTokenizer {

  /** Word histogram with initial char-level symbol strings. */
  private[operators] def wordHistogram(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t").rlike("^[a-z]+$"))
      .groupBy("t").agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("t"), "(.)", "<$1>").as("syms"), col("freq"))

  /** Freq-weighted adjacent-pair counts over a symbol-string histogram. */
  private[operators] def pairCounts(wf: DataFrame): DataFrame =
    wf.select(col("freq"),
        split(expr("substring(syms, 2, length(syms) - 2)"), "><").as("l"))
      .select(col("freq"),
        expr("slice(l, 1, size(l) - 1)").as("a"),
        expr("slice(l, 2, size(l) - 1)").as("b"))
      .select(col("freq"), explode(arrays_zip(col("a"), col("b"))).as("p"))
      .select(col("p.a").as("s1"), col("p.b").as("s2"), col("freq"))
      .groupBy("s1", "s2").agg(sum("freq").as("f"))

  /** Learn `k` merges; returns (step, lhs, rhs, freq) in learned order —
    * the tokenizer's merge table. Stops early if the corpus runs out of
    * pairs (every word fully merged).
    */
  def train(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var wf = wordHistogram(docs).persist(StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val best = pairCounts(wf)
        .orderBy(col("f").desc, col("s1").asc, col("s2").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (s1, s2, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step.toLong, s1, s2, f))
        val prev = wf
        // literal replace: symbols are bracket-wrapped [a-z]+ so the
        // search string is regex-metacharacter-free by construction
        wf = prev.select(
            expr(s"replace(syms, '<$s1><$s2>', '<$s1$s2>')").as("syms"),
            col("freq"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        wf.count() // materialize before dropping the parent
        prev.unpersist()
      }
      step += 1
    }
    wf.unpersist()
    merges.toSeq.toDF("step", "lhs", "rhs", "freq")
  }

  /** Encode `docs` with a learned merge table: applies the merges in
    * learned order to each word (map-only — the merge table is a LOCAL
    * array; at 100 TB this is the classic "broadcast the tokenizer"
    * shape) and emits (doc_id, n_tokens) per doc, where tokens are the
    * post-merge symbols. Words outside the `[a-z]+` contract count one
    * token per character cluster as-is (wrapped but never merged).
    */
  private def applyMergesExpr(merges: Array[(String, String)]): String =
    merges.foldLeft("regexp_replace(t, '(.)', '<$1>')") {
      case (acc, (a, b)) => s"replace($acc, '<$a><$b>', '<$a$b>')"
    }

  def encodeTokenCounts(docs: DataFrame, merges: Array[(String, String)]): DataFrame = {
    val applyAll = applyMergesExpr(merges)
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"),
        (length(expr(applyAll)) - length(translate(expr(applyAll), "<", "")))
          .cast("long").as("n"))
      .groupBy("doc_id").agg(sum("n").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Per-doc BPE token SEQUENCE (not just the count): each whitespace
    * word encodes to its post-merge symbol string (`hello` →
    * `<he><llo>` under a learned `h+e`/`l+l`/`ll+o`… table) and the
    * words rejoin in ORIGINAL order, space-separated — the bracket
    * form IS the token stream (split any word on `><` for the token
    * list). Order is restored deterministically via the
    * sort-by-position struct collect (collect_list alone is
    * partition-order dependent); one posexplode + map-side encode +
    * one hash agg per doc — the same broadcast-the-tokenizer shape as
    * [[encodeTokenCounts]].
    */
  def encodeTokens(docs: DataFrame, merges: Array[(String, String)]): DataFrame = {
    val applyAll = applyMergesExpr(merges)
    docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
      .select(col("doc_id"), col("pos"), expr(applyAll).as("w"))
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("encoded"))
  }

  /** Decode an [[encodeTokens]] stream back to text: merges never move
    * bytes across symbol boundaries, so stripping the symbol brackets
    * is the exact inverse — `decode(encodeTokens(text)) == text` for
    * any text free of literal `<`/`>` (the documented contract: markup
    * is stripped by [[TextExtraction]] long before tokenization).
    * One codegen'd `translate`; the round-trip is oracle-gated as a
    * corpus identity (q_bpe_roundtrip).
    */
  def decode(encoded: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    translate(encoded, "<>", "")

  /** Tokenizer fertility per stratum (language): BPE tokens emitted per
    * whitespace word — THE standard "does the learned vocab fit this
    * language" diagnostic (fertility ≈ 1 = words mostly merge whole;
    * high fertility = the language fragments). Map-only over the corpus
    * plus one stratum hash agg.
    */
  def fertilityByStratum(docs: DataFrame, merges: Array[(String, String)],
                         stratum: String = "lang"): DataFrame = {
    val applyAll = applyMergesExpr(merges)
    docs.select(col(stratum), explode(split(col("text"), " ")).as("t"))
      .select(col(stratum),
        (length(expr(applyAll)) - length(translate(expr(applyAll), "<", "")))
          .cast("long").as("n"))
      .groupBy(stratum).agg(sum("n").as("n_bpe"), count(lit(1)).as("n_words"))
      .select(col(stratum), col("n_bpe"), col("n_words"),
        round(col("n_bpe").cast("double") / col("n_words"), 6).as("fertility"))
      .orderBy(stratum)
  }
}
