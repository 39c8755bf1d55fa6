package graft

/** Phase-time side channel for composite bench rows.
  *
  * Many bench rows are COMPOSITES: they eagerly build a persisted index /
  * stage streaming input / drain a stream inside the query closure before
  * returning the served DataFrame. The bench harness times the whole
  * closure + count, so a regression in a 13 s composite was previously
  * unattributable ("the gate got slower" — round-7 verdict). Registrations
  * wrap their eager sub-steps in [[timed]]; [[graft.Bench]] emits the
  * collected per-phase seconds as a `"phases"` object next to `"queries"`
  * in the one-line JSON artifact, so round-over-round movement pins to a
  * specific phase (index build vs input staging vs stream drain vs the
  * residual serve/count).
  *
  * Semantics: within one repetition a phase may run several times (a
  * multi-slice stream stages+drains per slice) — [[timed]] ACCUMULATES, so
  * a phase value is that rep's total seconds in the phase. The harness
  * calls [[repStart]] before each rep and snapshots after, keeping the
  * phases of the rep whose TOTAL won the reported min — attribution and
  * total always come from the same run, so `total − Σ phases` is the
  * genuine residual (the lazy serve/count) — PROVIDED the sum excludes
  * the derived keys stream rows carry: `per_batch_s` (a mean),
  * `per_batch_max_s` (a max) and `pb_n` (a count), which are statistics
  * ABOUT the drain phase, not additional wall-clock. Recording is a
  * lock-free map
  * update (~100 ns) — zero impact on the timed work — and the
  * Verify/driver gate path never reads it.
  */
object BenchPhases {

  private val current =
    new scala.collection.concurrent.TrieMap[(String, String), Double]()

  /** Run `f`, adding its wall-clock seconds to (query, phase) for the
    * current repetition.
    */
  def timed[A](query: String, phase: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    val sec = (System.nanoTime() - t0) / 1e9
    current.updateWith((query, phase)) {
      case Some(prev) => Some(prev + sec)
      case None       => Some(sec)
    }
    a
  }

  /** Drain a streaming query inside the `drain` phase AND record the
    * per-micro-batch MARGINAL cost: mean seconds of data batches 2..n of
    * the REP (the rep's first data batch excluded — it carries cold JVM
    * codegen, state-store creation and first-touch I/O; empty
    * bookkeeping batches excluded too). Wall-clock drain time at toy
    * scale is dominated by fixed overhead (round-8 verdict: 31% of the
    * bench), so `per_batch_s` is the number that actually predicts 100×
    * behavior — with "steady state" meaning the ROW'S OWN deployment
    * shape: for continuous gates (one stream, `maxFilesPerTrigger`) it
    * is the within-stream marginal batch; for restart-per-slice gates
    * (q_cagg_streamed, q_rate_stream, …, which resume a checkpointed
    * query per arrival — the AvailableNow maintenance-loop shape) each
    * counted batch deliberately INCLUDES checkpoint resume, because
    * that is what every production arrival pays in that loop.
    *
    * `start` is by-name so stream construction counts as drain time, the
    * same envelope the inline `timed(...)(X.start(...).awaitTermination())`
    * call sites had. Rows that restart a query per input slice accumulate
    * across the restarts; `recentProgress` retains the last 100 progress
    * events, far above any bench row's batch count.
    */
  def drainTimed(query: String)(start: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val sq = timed(query, "drain") { val q = start; q.awaitTermination(); q }
    sq.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .sortBy(_.batchId)
      .flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toDouble / 1000.0))
      .foreach { sec =>
        if (current.putIfAbsent((query, PbSeen), 1.0).isEmpty) ()
        else {
          current.updateWith((query, PbSum)) { prev => Some(prev.getOrElse(0.0) + sec) }
          current.updateWith((query, PbCnt)) { prev => Some(prev.getOrElse(0.0) + 1.0) }
          current.updateWith((query, PbMax)) { prev => Some(math.max(prev.getOrElse(0.0), sec)) }
        }
      }
  }

  private val PbSeen = "__pb_seen"
  private val PbSum = "__pb_sum"
  private val PbCnt = "__pb_cnt"
  private val PbMax = "__pb_max"

  /** Reset accumulation — the harness calls this before each rep. */
  def repStart(): Unit = current.clear()

  /** This rep's phases for one query (empty for non-composite rows).
    * The hidden per-batch accumulators fold into `per_batch_s` (MEAN
    * marginal batch seconds), `per_batch_max_s` (the WORST marginal
    * batch — one GC pause or state-store hiccup shows up here, not
    * smeared into the mean) plus `pb_n` (how many marginal batches the
    * mean covers — a count, not seconds).
    */
  def repSnapshot(query: String): Map[String, Double] = {
    val all = current.readOnlySnapshot().collect {
      case ((q, p), s) if q == query => p -> s
    }.toMap
    val visible = all -- Seq(PbSeen, PbSum, PbCnt, PbMax)
    (all.get(PbSum), all.get(PbCnt)) match {
      case (Some(sum), Some(cnt)) if cnt > 0 =>
        visible ++ Seq("per_batch_s" -> sum / cnt, "pb_n" -> cnt,
          "per_batch_max_s" -> all.getOrElse(PbMax, 0.0))
      case _ => visible
    }
  }
}
