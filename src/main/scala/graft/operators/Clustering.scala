package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn near-dup PAIRS (any [[Dedup]] tier)
  * into CLUSTERS, then keep one representative per cluster — the step a
  * real corpus pipeline runs after pair generation, since transitive
  * duplicates (A≈B, B≈C) must all collapse to one kept document even when
  * (A, C) itself was never emitted as a pair.
  *
  * Components are computed with alternating large-star / small-star
  * rounds (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", ACM SoCC 2014): each round is two groupBy shuffles keyed on
  * node id, and the edge set converges to per-component stars rooted at
  * the component's minimum id in O(log² n) rounds — in practice a
  * handful, since dedup graphs have small, dense components. This is the
  * 100 TB shape: no driver-side graph, no O(diameter) propagation (a
  * plain min-label-propagation loop needs one round PER HOP of component
  * diameter; duplicate chains make that unbounded), every round's state
  * is just the (shrinking) edge list.
  */
object Clustering {

  /** One lineage cut per iteration: an iterative DataFrame loop otherwise
    * accretes an unbounded plan (analysis cost grows per round, and a
    * failure recomputes every previous round). Uses reliable
    * `checkpoint()` when the session has a checkpoint dir (the right mode
    * on a real cluster — recomputable after executor loss), else eager
    * `localCheckpoint()` (single-JVM local mode).
    *
    * Round hygiene: the contraction loop unpersists every round's cut as
    * soon as the NEXT round has materialized (only ~2 edge-list copies
    * live at a time, not O(iterations) — the kCenters pattern). Reliable
    * checkpoint FILES are cleaned by Spark's context cleaner only when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`; cluster
    * deployments running a daily updateComponents loop should set it, or
    * the checkpoint dir grows by a handful of edge-list snapshots per
    * day.
    */
  private def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    // LAZY local checkpoint: the [[edgeStats]] aggregate that follows
    // every cut IS the materializing action, so each round runs one
    // job instead of checkpoint-job + aggregate-job (the
    // LinkGraph.truncateLineageFused discipline; reliable checkpoints
    // stay eager — a lazy reliable checkpoint re-runs the producing
    // job to write its files). The loop's unpersist of the superseded
    // round happens only after the successor's edgeStats ran, so the
    // lazy frame is always materialized before its inputs release.
    else df.localCheckpoint(false)

  /** Large-star: every node connects its strictly-larger neighbors to the
    * minimum of its neighborhood (including itself). Input and output are
    * canonical directed edges (u > v).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val und = e.select("u", "v")
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val m = und.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    und.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: every node connects its smaller neighbors (and itself)
    * to the minimum of those neighbors. On canonical edges the smaller
    * neighborhood of `u` is exactly its out-edges.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy("u").agg(min("v").as("m"))
    val vm = e.join(m, "u").filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val um = m.select(col("u"), col("m").as("v"))
    vm.union(um).filter(col("u") =!= col("v")).distinct()
  }

  /** (row count, XOR of per-edge xxhash64) in ONE action — the cheap
    * per-round convergence probe. XOR is order-insensitive and cannot
    * overflow (ANSI-mode `sum` over 64-bit hashes would); both sides are
    * distinct sets, so equal (count, checksum) is set equality up to a
    * 64-bit hash collision — which the final `except` confirmation
    * catches.
    */
  private def edgeStats(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Connected components of the undirected graph given by an edge list.
    * Returns (node, component) for every node incident to ≥1 edge, with
    * `component` = the minimum node id of the component. Self-loops are
    * ignored; orientation of the input pairs doesn't matter.
    *
    * Convergence detection is two-tier: each round runs ONE aggregation
    * job ([[edgeStats]] — count + xxhash64 XOR checksum, compared against
    * the previous round's cached value) instead of the two counts plus a
    * full anti-join shuffle a naive set-equality per round would cost;
    * only a checksum MATCH triggers the exact `except` confirmation, so
    * the expensive job runs once, at the fixpoint (plus a vanishing
    * ~2⁻⁶⁴ per-round collision chance, where it correctly rejects and the
    * loop continues). At the fixpoint the edge set IS the star
    * assignment. `maxIter` is a runaway bound, not a tuning knob —
    * hitting it throws rather than returning half-merged components.
    */
  def connectedComponents(edges: DataFrame, src: String = "doc_a",
                          dst: String = "doc_b", maxIter: Int = 25,
                          nodeType: String = "long"): DataFrame = {
    // the star contraction only needs a TOTAL ORDER on node ids —
    // greatest/least/min work on any orderable type, so string-keyed
    // graphs (canonical URLs in [[LinkGraph.components]]) run the same
    // rounds with `nodeType = "string"`; the long default keeps the
    // dedup-cluster callers' output dtype unchanged
    var e = cut(edges
      .select(greatest(col(src), col(dst)).cast(nodeType).as("u"),
        least(col(src), col(dst)).cast(nodeType).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    var stats = edgeStats(e)
    var converged = false
    var iter = 0
    // the round that produced the CURRENT e — released once e's
    // successor exists and the convergence compare (which reads e) ran;
    // the final e stays persisted because the returned frame reads it
    var prev: Option[DataFrame] = None
    while (!converged && iter < maxIter) {
      val next = cut(smallStar(largeStar(e)))
      val nextStats = edgeStats(next)
      converged = nextStats == stats && next.except(e).isEmpty
      prev.foreach(_.unpersist())
      prev = Some(e)
      e = next
      stats = nextStats
      iter += 1
    }
    prev.foreach(_.unpersist())
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    e.select(col("u").as("node"), col("v").as("component"))
      .union(e.select(col("v").as("node"), col("v").as("component")))
      .distinct()
  }

  /** Incremental component update — the daily-crawl shape for cluster
    * resolution: yesterday's (node, component) ASSIGNMENT is re-used as
    * its star edge set (node—component, already a converged fixpoint) and
    * unioned with today's NEW pairs; the contraction loop then only pays
    * for the merges the new edges actually cause (the old stars converge
    * in O(1) rounds on their own). Exactly equal to recomputing
    * [[connectedComponents]] over the full accumulated pair set — star
    * edges preserve connectivity, and min-id labels are monotone under
    * union — with per-day cost ∝ |assignment| + |new pairs| instead of
    * |all pairs ever|.
    */
  def updateComponents(assignment: DataFrame, newPairs: DataFrame,
                       src: String = "doc_a", dst: String = "doc_b",
                       maxIter: Int = 25, nodeType: String = "long"): DataFrame = {
    val oldEdges = assignment
      .select(col("node").as(src), col("component").as(dst))
      .filter(col(src) =!= col(dst))
    val cc = connectedComponents(
      oldEdges.unionByName(newPairs.select(col(src), col(dst))), src, dst,
      maxIter, nodeType)
    // Singleton assignment rows (node == component — present when the
    // caller feeds [[assignComponents]] output rather than
    // [[connectedComponents]] output) carry no edge into the contraction;
    // without this re-union they would silently vanish from the result.
    // Keep them labeled-to-self unless today's pairs merged them.
    val singletons = assignment
      .filter(col("node") === col("component"))
      .select(col("node").cast(nodeType).as("node"))
      .join(cc.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    cc.unionByName(singletons)
  }

  /** (id, component) for EVERY row of `docs`: documents in no duplicate
    * pair form their own singleton component. The component map is
    * proportional to the number of duplicated documents, not the corpus —
    * AQE broadcasts it when small.
    */
  def assignComponents(docs: DataFrame, pairs: DataFrame,
                       idCol: String = "doc_id", src: String = "doc_a",
                       dst: String = "doc_b"): DataFrame = {
    val comp = connectedComponents(pairs, src, dst)
      .withColumnRenamed("node", idCol)
    docs.select(col(idCol).cast("long").as(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("component"), col(idCol)).as("component"))
  }

  /** Keep-one-per-cluster dedup: drops every document whose component
    * representative (minimum id) is some other document. The anti-join
    * key set is only the NON-representatives — strictly smaller than the
    * component map — so the corpus side stays narrow.
    */
  def keepRepresentatives(docs: DataFrame, pairs: DataFrame,
                          idCol: String = "doc_id", src: String = "doc_a",
                          dst: String = "doc_b"): DataFrame = {
    val nonReps = connectedComponents(pairs, src, dst)
      .filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    docs.join(nonReps, Seq(idCol), "left_anti")
  }

  /** Keep-BEST-per-cluster dedup: like [[keepRepresentatives]], but the
    * survivor is the cluster's argmax over a caller-supplied quality score
    * (ties broken by minimum id) instead of the arbitrary min-id document
    * — the curation-grade policy (of a near-dup cluster, keep the highest-
    * quality copy, not whichever crawled first).
    *
    * `scores` carries (idCol, scoreCol); only CLUSTERED ids are looked up,
    * so the score join is ∝ the duplicated subset, not the corpus. The
    * argmax is one hash agg (`min` over a (−score, id) struct — no
    * per-cluster sort or window); the final anti-join key set is again
    * only the non-survivors. Callers should pass a score that is already
    * deterministically rounded (e.g. [[TextAnalysis.qualityScore]]'s 6-dp
    * output) so the argmax boundary is engine-identical.
    */
  def keepBest(docs: DataFrame, pairs: DataFrame, scores: DataFrame,
               idCol: String = "doc_id", scoreCol: String = "quality",
               src: String = "doc_a", dst: String = "doc_b"): DataFrame = {
    val comp = connectedComponents(pairs, src, dst)
    // LEFT join + worst-case default, not inner: an inner join would
    // silently DELETE a cluster whose ids are all absent from `scores`
    // (its nodes still reach nonKept below but never the argmax). With
    // −∞ as the default, scored nodes always win over unscored ones and
    // an all-unscored cluster still keeps its min-id representative.
    val scored = comp.join(
        scores.select(col(idCol).cast("long").as("node"), col(scoreCol)),
        Seq("node"), "left")
      .withColumn(scoreCol, coalesce(col(scoreCol), lit(Double.NegativeInfinity)))
    val keep = scored.groupBy("component")
      .agg(min(struct((-col(scoreCol)).as("ns"), col("node").as("node"))).as("b"))
      .select(col("b.node").as("node"))
    val nonKept = comp.join(keep, Seq("node"), "left_anti")
      .select(col("node").as(idCol))
    docs.join(nonKept, Seq(idCol), "left_anti")
  }
}
