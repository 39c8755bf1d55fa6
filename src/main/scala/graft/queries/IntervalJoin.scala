package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join via time binning.
  *
  * The naive plan for `p.ts BETWEEN i.start AND i.end` with no equality
  * key is a BroadcastNestedLoopJoin — O(|points|·|intervals|) compares
  * and a broadcast of one whole side, the classic scale cliff of range
  * joins. Binning restores an equi-join: each interval is exploded to
  * the fixed-width time bins it covers, each point maps to exactly one
  * bin, and the join runs on (keys…, bin) with the precise range
  * predicate applied AFTER the hash match. Every (point, interval) match
  * appears exactly once (the point's bin is unique), so no dedup pass.
  *
  * Cost model: interval replication = Σ ceil(span/binWidth); per-bin work
  * = points-in-bin × intervals-covering-bin. Pick `binWidthUs` near the
  * median interval span — too small replicates long intervals across
  * many bins, too large degrades toward per-bin cross products. Skewed
  * inputs (one very long interval, or a hot bin) are the usual salting
  * candidates; at 100 TB this join shuffles both sides by (keys…, bin),
  * never broadcasts a corpus, and never nested-loops.
  */
object IntervalJoin {

  /** Join `points` to every interval containing them: half-open
    * [start, end) containment, µs-integer columns. `keyCols` (optional)
    * are additional equality keys present on both sides (e.g. the
    * subject); intervals may overlap — a point matches each containing
    * interval. Empty intervals (end ≤ start) match nothing.
    *
    * Bin math is FLOOR division, so negative epochs (pre-1970
    * timestamps — real in IoT backfills) bin correctly: truncating
    * `div` would place a negative timestamp one slot too high and
    * silently drop matches at bin boundaries.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tsCol: String, startCol: String, endCol: String,
                      binWidthUs: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidthUs > 0, "binWidthUs must be positive")
    // Exact integer floor division that stays BIGINT (no double rounding
    // at µs magnitudes): pmod(a, w) ∈ [0, w), so a − pmod(a, w) is the
    // floor multiple and the `div` is exact — for any sign of a.
    def floorBin(e: String) = s"(($e) - pmod(($e), ${binWidthUs}L)) div ${binWidthUs}L"
    // end-exclusive ⇒ last covered bin is floor((end − 1) / w). The
    // end > start guard also keeps `sequence` from silently generating
    // a DESCENDING bin range for empty intervals.
    val binned = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bin", explode(sequence(
        expr(floorBin(s"`$startCol`")),
        expr(floorBin(s"`$endCol` - 1")))))
    points
      .withColumn("_bin", expr(floorBin(s"`$tsCol`")))
      .join(binned, (keyCols :+ "_bin").toSeq)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bin")
  }
}
