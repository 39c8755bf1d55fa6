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
  * genuine residual (the lazy serve/count). Recording is a lock-free map
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

  /** Reset accumulation — the harness calls this before each rep. */
  def repStart(): Unit = current.clear()

  /** This rep's phases for one query (empty for non-composite rows). */
  def repSnapshot(query: String): Map[String, Double] =
    current.readOnlySnapshot().collect {
      case ((q, p), s) if q == query => p -> s
    }.toMap
}
