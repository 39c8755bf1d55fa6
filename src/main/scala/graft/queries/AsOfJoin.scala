package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the latest right value
  * with `right.ts <= left.ts` within the same key. The classic timeseries
  * operator Spark lacks natively (guide §custom-operators); following the
  * preference order it is COMPOSED from built-ins rather than a custom
  * SparkPlan: union both sides with a marker, then one
  * `last(value, ignoreNulls)` running window per key — a single
  * sort-per-key pipeline, no range-join explosion, identical semantics to
  * DuckDB/kdb `ASOF JOIN`.
  *
  * Scale shape: one shuffle on the key, one sort on (ts, marker) — the
  * same cost as any windowed query over the union; a naive
  * `left.ts >= right.ts` range join would be O(|L|·|R|) per key.
  */
object AsOfJoin {

  /** Shared union-marker core of both directions: union the marked
    * sides, run one `last(carried, ignoreNulls)` window in the given
    * time order (right sorts before left at equal ts → ties visible),
    * keep left rows with the match in `__m`.
    *
    * NULL-key note (both directions): `Window.partitionBy` groups NULL
    * keys into ONE partition, which would let NULL-key left rows match
    * NULL-key right rows — in SQL (and the DuckDB ASOF oracle) NULL never
    * matches. The RIGHT side is therefore filtered to non-null keys: a
    * NULL-key left row then sits in a left-only partition whose running
    * `last(carried)` is null, i.e. it is KEPT with no match — exactly
    * ASOF LEFT JOIN semantics (filtering the left side too would instead
    * drop those rows, diverging from LEFT JOIN).
    */
  private def asofScan(l: DataFrame, r: DataFrame, keyCol: String,
                       tsCol: String, carried: String,
                       descending: Boolean): DataFrame = {
    val ord = if (descending) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keyCol).orderBy(ord, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.union(r.filter(col(keyCol).isNotNull))
      .withColumn("__m", last(carried, ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
  }

  /** `left(keyCol, tsCol, leftVal)` ⨝asof `right(keyCol, tsCol, rightVal)`
    * → (key, ts, leftVal, rightVal-as-of-ts); left rows with no earlier
    * right row keep a null rightVal (ASOF LEFT JOIN semantics). At equal
    * timestamps the right row is visible to the left row (`>=`).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               leftVal: String, rightVal: String): DataFrame = {
    val l = left.select(col(keyCol), col(tsCol),
      col(leftVal).as("__lv"), lit(null).cast(right.schema(rightVal).dataType).as("__rv"),
      lit(1).as("__side"))
    val r = right.select(col(keyCol), col(tsCol),
      lit(null).cast(left.schema(leftVal).dataType).as("__lv"), col(rightVal).as("__rv"),
      lit(0).as("__side"))
    asofScan(l, r, keyCol, tsCol, "__rv", descending = false)
      .select(col(keyCol), col(tsCol), col("__lv").as(leftVal),
        col("__m").as(rightVal))
  }

  /** Forward as-of: for every left row, the EARLIEST right timestamp with
    * `right.ts >= left.ts` in the same key (ties visible, mirroring
    * [[asofJoin]]); null when no later right row exists. The funnel /
    * conversion primitive ("first response after each anchor") — callers
    * apply a horizon as a filter on `next_ts - ts`.
    *
    * The backward composition run in REVERSE time order (equivalently: a
    * backward as-of on negated timestamps, which is also how the DuckDB
    * oracle replays it). One shuffle on the key, one sort.
    */
  def asofNext(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String): DataFrame = {
    val l = left.select(col(keyCol), col(tsCol),
      lit(null).cast(right.schema(tsCol).dataType).as("__rts"), lit(1).as("__side"))
    val r = right.select(col(keyCol), col(tsCol),
      col(tsCol).as("__rts"), lit(0).as("__side"))
    asofScan(l, r, keyCol, tsCol, "__rts", descending = true)
      .select(col(keyCol), col(tsCol), col("__m").as("next_ts"))
  }
}
