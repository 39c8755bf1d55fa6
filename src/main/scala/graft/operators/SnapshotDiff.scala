package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot comparison — the bookkeeping layer of a recurring
  * training-data pipeline: which documents appeared, vanished, or changed
  * between two crawls, and how far the token distribution moved. Both
  * are cheap, shuffle-bounded passes a 100 TB pipeline runs per snapshot
  * as regression guards (a sudden spike in `removed` or a fat KL tail is
  * how silent crawler/extractor regressions get caught).
  */
object SnapshotDiff {

  /** Document-level diff: (doc_id, status) for every id whose membership
    * or content changed — `added` (new only), `removed` (old only),
    * `changed` (both, content hash differs). Unchanged documents emit
    * nothing, so the result is proportional to the churn, not the corpus.
    *
    * Content equality is md5-hash equality: texts never travel through
    * the join — each side reduces to (id, 16-byte hash) at the scan, so
    * the shuffle carries fixed-width rows regardless of document size.
    */
  def diff(oldDocs: DataFrame, newDocs: DataFrame,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val o = oldDocs.select(col(idCol).as("id_o"), md5(col(textCol)).as("h_o"))
    val n = newDocs.select(col(idCol).as("id_n"), md5(col(textCol)).as("h_n"))
    o.join(n, col("id_o") === col("id_n"), "full_outer")
      .filter(col("id_o").isNull || col("id_n").isNull || col("h_o") =!= col("h_n"))
      .select(coalesce(col("id_o"), col("id_n")).as(idCol),
        when(col("id_o").isNull, "added")
          .when(col("id_n").isNull, "removed")
          .otherwise("changed").as("status"))
      .orderBy(idCol)
  }

  /** Token-distribution drift between two snapshots: per-token
    * contributions to KL(new ‖ old) under add-one smoothing over the
    * union vocabulary — `kl_term = q·ln(q/p)` with
    * `q = (cnt_new+1)/(total_new+V)`, `p = (cnt_old+1)/(total_old+V)`.
    * Returns the top-k tokens by absolute contribution (the tokens that
    * moved the distribution most, in either direction) with their exact
    * counts; Σ over ALL terms is the full KL divergence if the caller
    * wants the scalar.
    *
    * Smoothing makes every term finite (a token absent from one side has
    * probability 1/(total+V), not 0), so the statistic is defined for
    * disjoint vocabularies too.
    *
    * Scale shape: two token hash-aggs (map-side partials) + one
    * full-outer merge on token; the totals are a 1-row aggregate
    * broadcast back — no driver collect, no global sort (top-k is
    * TakeOrderedAndProject on the rounded term).
    */
  def tokenDrift(oldDocs: DataFrame, newDocs: DataFrame, k: Int = 50,
                 textCol: String = "text"): DataFrame = {
    def counts(docs: DataFrame, cnt: String) =
      docs.select(explode(split(col(textCol), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as(cnt))
    val joined = counts(oldDocs, "cnt_old")
      .join(counts(newDocs, "cnt_new"), Seq("token"), "full_outer")
      .na.fill(0L, Seq("cnt_old", "cnt_new"))
    val tot = joined.agg(sum("cnt_old").as("t_old"), sum("cnt_new").as("t_new"),
      count(lit(1)).as("v"))
    val q = (col("cnt_new") + lit(1.0)) / (col("t_new") + col("v"))
    val p = (col("cnt_old") + lit(1.0)) / (col("t_old") + col("v"))
    joined.crossJoin(broadcast(tot))
      .select(col("token"), col("cnt_old"), col("cnt_new"),
        round(q * log(q / p), 6).as("kl_term"))
      .orderBy(abs(col("kl_term")).desc, col("token").asc)
      .limit(k)
  }
}
