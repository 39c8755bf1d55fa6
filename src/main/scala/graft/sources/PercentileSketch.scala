package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composable percentile sketch — the TimescaleDB-toolkit `percentile_agg`
  * / UDDSketch shape (reference dashboards would call
  * `approx_percentile(0.95, percentile_agg(value))` over a continuous
  * aggregate): values are binned into log-spaced buckets, the sketch is
  * the per-bucket count vector, and any percentile is served by walking
  * the cumulative counts to the target rank. Count vectors ADD, so
  * sketches merge exactly across time buckets, partitions, and refreshes
  * — the property that makes percentiles continuous-aggregate-able at
  * 100 TB (exact percentiles don't compose; a stored rank walk does).
  *
  * Bucketing (engine-portable by construction, no FP anywhere):
  * for non-negative integer cents `c = round(value·scale)`,
  *   `bl  = length(bin(c))`            — the bit length (log₂ tier)
  *   `sub = c >> max(bl − subBits, 0)` — top `subBits` bits (sub-bucket)
  * The (bl, sub) key orders buckets by value range, disjointly; the
  * served estimate is the bucket's LOWER EDGE `sub << (bl − subBits)`.
  * For the rank-selected true value v this gives
  * `v·(1 − 2^(1−subBits)) < est ≤ v` — a guaranteed relative error of
  * 2^(1−subBits) (≈1.6% two-sided at subBits=6, halved per extra bit);
  * values with fewer than `subBits` bits are represented EXACTLY.
  * Everything is integer arithmetic Spark and DuckDB evaluate
  * identically (`bin`/`length`/shifts), so the contract is hash-exact,
  * unlike a γ-log sketch whose `ceil(log(x)/log(γ))` boundary cells
  * depend on libm rounding.
  *
  * Negative values are out of the sketch's domain (as in the toolkit's
  * uddsketch negatives are a separate sign store) — the scan filters
  * `measurement_number ≥ 0` and the scaladoc is the contract.
  *
  * Scale shape: building partials is one hash aggregation on
  * (date, bucket_s, bl, sub) — key cardinality is buckets × ≤2^subBits
  * sub-buckets × ~40 tiers, NOT row-proportional. Serving re-buckets the
  * partials (already tiny) with one window pass per served range.
  */
object PercentileSketch {

  /** Per-(date, bucket, sketch-cell) counts for one metric. */
  def partials(conditions: DataFrame, of: String, startS: Long, endS: Long,
               widthS: Long, subBits: Int, scale: Int = 100): DataFrame = {
    require(widthS > 0 && scale > 0, "widthS and scale must be positive")
    require(subBits >= 1 && subBits <= 40, s"subBits out of range: $subBits")
    conditions.filter(
        col("measurement_of") === of &&
        col("measurement_number").isNotNull &&
        col("measurement_number") >= 0 &&
        col("timestamp") >= timestamp_seconds(lit(startS)) &&
        col("timestamp") < timestamp_seconds(lit(endS)))
      .select(col("timestamp"),
        round(col("measurement_number") * scale, 0).cast("long").as("c"))
      // the shared origin-anchored grid (see ContinuousAggregate.OriginS)
      .withColumn("bucket_s", ContinuousAggregate.bucketOfTimestamp(widthS))
      .withColumn("date", to_date(col("timestamp")))
      .withColumn("bl", length(bin(col("c"))).cast("int"))
      .withColumn("sub", expr(s"shiftright(c, greatest(bl - $subBits, 0))"))
      .groupBy("date", "bucket_s", "bl", "sub")
      .agg(count(lit(1)).as("n"))
  }

  /** Materialize the sketch partials date-partitioned (the percentile
    * continuous aggregate). `widthS`/`subBits` are the store's fixed
    * creation parameters, as with [[ContinuousAggregate.create]].
    */
  def create(conditions: DataFrame, path: String, of: String, startS: Long,
             endS: Long, widthS: Long, subBits: Int, scale: Int = 100): Unit =
    partials(conditions, of, startS, endS, widthS, subBits, scale)
      .repartition(col("date"))
      .write.mode("overwrite").partitionBy("date").parquet(path)

  /** Incremental refresh: recompute only dates ≥ `sinceDate` and
    * dynamic-overwrite exactly those partitions — counts are composable,
    * so refreshed partials merge with untouched ones exactly.
    */
  def refresh(conditions: DataFrame, path: String, of: String, startS: Long,
              endS: Long, widthS: Long, subBits: Int, sinceDate: String,
              scale: Int = 100): Unit = {
    require(sinceDate.matches("""\d{4}-\d{2}-\d{2}"""),
      s"sinceDate must be yyyy-MM-dd, got $sinceDate")
    val spark = conditions.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try partials(
        conditions.filter(to_date(col("timestamp")) >= lit(sinceDate)),
        of, startS, endS, widthS, subBits, scale)
      .repartition(col("date"))
      .write.mode("overwrite").partitionBy("date").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Serve p50/p95/p99 per `widthS` bucket FROM stored partials (widthS
    * must be a multiple of the store's creation width; bounds half-open
    * and store-bucket-aligned, the [[ContinuousAggregate.query]]
    * containment rule). Ranks are ceil(N·p) computed in pure integers;
    * the estimate is the lower edge of the cell whose cumulative count
    * reaches the rank. Output cents are exact BIGINTs.
    */
  def query(spark: SparkSession, path: String, startS: Long, endS: Long,
            widthS: Long, subBits: Int): DataFrame = {
    val merged = spark.read.parquet(path)
      .filter(col("bucket_s") >= startS && col("bucket_s") < endS)
      .withColumn("time_s",
        expr(s"((bucket_s - pmod(bucket_s, ${widthS}L)) div ${widthS}L) * ${widthS}L"))
      .groupBy("time_s", "bl", "sub")
      .agg(sum("n").as("n"))
    val wCum = Window.partitionBy("time_s").orderBy("bl", "sub")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("time_s")
    val edge = expr(s"shiftleft(sub, greatest(bl - $subBits, 0))")
    // ceil(total·p) in pure integers: (total·numer + 99) div 100 — both
    // operands positive, so truncating div IS floor, matching DuckDB `//`
    def pct(numer: Int): org.apache.spark.sql.Column =
      min(when(col("cum") >= expr(s"(total * $numer + 99) div 100"), edge))
    merged
      .withColumn("cum", sum("n").over(wCum))
      .withColumn("total", sum("n").over(wAll))
      .groupBy("time_s")
      .agg(pct(50).as("p50_cents"), pct(95).as("p95_cents"),
        pct(99).as("p99_cents"), max("total").as("n_values"))
      .orderBy("time_s")
  }
}
