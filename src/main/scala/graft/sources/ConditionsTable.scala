package graft.sources

import graft.model.TimeseriesRecord
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The `conditions` table — storage boundary of the normalize pipeline.
  *
  * The reference stores into a TimescaleDB hypertable chunked on `timestamp`
  * with secondary indexes on subject/of/publisher
  * (`db/create_table_and_roles.sql:35-59`). The Spark-native analogue is
  * date-partitioned Parquet: partition pruning replaces hypertable chunk
  * exclusion, and Parquet column statistics (min/max per row group) replace
  * the B-tree/hash indexes for the standard
  * `(measurement_of, measurement_subject, timestamp BETWEEN ...)` scan.
  *
  * At 100 TB: one partition per day keeps partitions O(100 GB); within a
  * partition, sorting by `(measurement_of, measurement_subject, timestamp)`
  * at write time clusters row groups so the dashboard predicates prune
  * row groups too, not just partitions.
  */
object ConditionsTable {

  /** Normalize a set of raw event-hub strings into atomic records.
    * Narrow transformation — no shuffle; each input row fans out to 0..n
    * records. Correlation ids are injected per-message (uuid in prod;
    * deterministic in tests), mirroring `create_correlation_id`
    * (`shared_code/helpers.py:98-103`).
    */
  def normalize(spark: SparkSession, raw: Dataset[String],
                correlationId: String => Option[String] =
                  _ => Some(graft.util.Util.fastRandomUuid()))
      : Dataset[TimeseriesRecord] = {
    import spark.implicits._
    raw.flatMap(s => graft.convert.Converters.convertEvent(s, correlationId(s))
      .getOrElse(Vector.empty))
  }

  /** Dead-letter side output: the raw events [[normalize]] would drop
    * (parse/validation failures and unknown publishers — the rows the
    * reference logs and skips, `shared_code/json_converter.py:65-69`).
    * Filtered events (uninteresting topics) are NOT dead letters. A
    * monitoring-path second pass by design — the hot path stays a single
    * narrow flatMap.
    */
  def deadLetters(spark: SparkSession, raw: Dataset[String]): Dataset[String] = {
    import spark.implicits._
    raw.filter(s => graft.convert.Converters.convertEventEither(s).isLeft)
  }

  /** Wire records → storage rows: parse the ISO wire timestamp to a real
    * TimestampType, encode geography as WKT, add the partition date.
    */
  def toStorage(records: Dataset[TimeseriesRecord]): DataFrame =
    records.toDF()
      .withColumn("measurement_location",
        when(col("measurement_location").isNotNull,
          format_string("SRID=4326;POINT(%s %s)",
            col("measurement_location").getItem(1),
            col("measurement_location").getItem(0))))
      .withColumn("timestamp",
        to_timestamp(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))
      .withColumn("date", to_date(col("timestamp")))

  /** Parse back a stored `SRID=4326;POINT(lon lat)` location to
    * `(lat, lon)`, validating the SRID and the PostGIS
    * `geography(Point,4326)` coordinate ranges (lon ∈ [-180,180],
    * lat ∈ [-90,90]) — the read half of the round-trip the reference
    * exercises against TimescaleDB
    * (`shared_code/test/test_timescale.py:434-545`,
    * `db/create_table_and_roles.sql:44`). Returns None for any other
    * geometry, SRID, or out-of-range point.
    */
  private val WktPoint =
    """SRID=(\d+);POINT\((-?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?) (-?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)\)""".r
  def parseLocation(wkt: String): Option[(Double, Double)] = wkt match {
    case WktPoint("4326", lonS, latS) =>
      val lon = lonS.toDouble
      val lat = latS.toDouble
      if (lon >= -180 && lon <= 180 && lat >= -90 && lat <= 90) Some((lat, lon))
      else None
    case _ => None
  }

  /** Distributed (codegen'd) variant of [[parseLocation]]: extracts
    * `(lat, lon)` columns from a WKT location column; null for invalid
    * SRID/shape/range. regexp_extract + range guards, no UDF.
    */
  def locationLatLon(wkt: org.apache.spark.sql.Column): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val pat = "^SRID=4326;POINT\\((-?[0-9.eE+-]+) (-?[0-9.eE+-]+)\\)$"
    val lon = regexp_extract(wkt, pat, 1).cast("double")
    val lat = regexp_extract(wkt, pat, 2).cast("double")
    val valid = lon.isNotNull && lat.isNotNull &&
      lon.between(-180, 180) && lat.between(-90, 90)
    (when(valid, lat), when(valid, lon))
  }

  /** PostgreSQL/TimescaleDB DDL for the conditions sink table — the SQL
    * a JDBC parity deployment runs once before
    * [[graft.streaming.IngestPipeline.jdbcBatchWriter]] starts
    * appending. Re-derived from the reference's provisioning semantics
    * (`db/create_table_and_roles.sql:35-59`): identical columns, types
    * and nullability (`timestamp with time zone`, `geography(Point,
    * 4326)` for the WKT the sink writes, the sequence-backed
    * `measurement_unique_id`), the same eight secondary indexes (hash
    * for the equality-only dispatch columns, B-tree elsewhere,
    * descending on `"timestamp"`), and the hypertable conversion
    * chunked on `"timestamp"`. Roles/users/grants are deployment
    * provisioning outside the engine (SURVEY §2B/B10) and are
    * deliberately not emitted. No PG exists in this environment; the
    * text is golden-tested against the reference's semantics
    * (`PgDdlSpec`) so a parity deployment can run it verbatim.
    */
  def pgDdl(tableName: String): String = {
    require(tableName.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"tableName must be a plain SQL identifier, got '$tableName'")
    val seq = s"${tableName}_measurement_unique_id_sequence"
    s"""CREATE EXTENSION IF NOT EXISTS timescaledb CASCADE;
       |CREATE EXTENSION IF NOT EXISTS postgis CASCADE;
       |CREATE SEQUENCE IF NOT EXISTS $seq START 1;
       |CREATE TABLE IF NOT EXISTS $tableName (
       |    "timestamp"             timestamp with time zone NOT NULL,
       |    "measurement_subject"   text NOT NULL,
       |    "measurement_number"    double precision,
       |    "measurement_of"        text NOT NULL,
       |    "measurement_string"    text,
       |    "correlation_id"        text,
       |    "measurement_bool"      boolean,
       |    "measurement_publisher" text,
       |    "measurement_location"  geography(Point,4326),
       |    measurement_unique_id   bigint NOT NULL DEFAULT nextval('$seq')
       |);
       |CREATE INDEX IF NOT EXISTS ${tableName}_correlation_id_idx ON $tableName (correlation_id);
       |CREATE INDEX IF NOT EXISTS ${tableName}_measurement_bool_idx ON $tableName (measurement_bool);
       |CREATE INDEX IF NOT EXISTS ${tableName}_measurement_number_idx ON $tableName (measurement_number);
       |CREATE INDEX IF NOT EXISTS ${tableName}_measurement_of_idx ON $tableName USING hash (measurement_of);
       |CREATE INDEX IF NOT EXISTS ${tableName}_measurement_publisher_idx ON $tableName USING hash (measurement_publisher);
       |CREATE INDEX IF NOT EXISTS ${tableName}_measurement_string_idx ON $tableName (measurement_string);
       |CREATE INDEX IF NOT EXISTS ${tableName}_measurement_subject_idx ON $tableName USING hash (measurement_subject);
       |CREATE INDEX IF NOT EXISTS ${tableName}_timestamp_idx ON $tableName ("timestamp" DESC);
       |SELECT create_hypertable('$tableName', 'timestamp', if_not_exists => TRUE);
       |""".stripMargin
  }

  /** The exact frame a PG parity deployment inserts into a [[pgDdl]]
    * table: the [[toStorage]] output minus the parquet partition helper
    * (`date` — PG chunks on time via the hypertable instead) and minus
    * the wire-format routing tag (`measurement_data_type` — the
    * reference consults it to pick the typed column at insert time and
    * never stores it, `shared_code/timescale.py:109-117`; our normalize
    * already routed the value into number/string/bool, so the tag is
    * redundant by the time rows reach a sink).
    */
  def pgRows(storage: DataFrame): DataFrame =
    storage.drop("date", "measurement_data_type")

  /** Write date-partitioned, row-group-clustered Parquet. */
  def write(storage: DataFrame, path: String): Unit =
    storage
      .repartition(col("date"))
      .sortWithinPartitions("measurement_of", "measurement_subject", "timestamp")
      .write.mode("overwrite").partitionBy("date").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed variant of [[write]] for subject-heavy workloads: pre-shuffle
    * the store into `buckets` hash buckets on `measurement_subject` (sorted
    * by subject, timestamp within each bucket file). Catalyst then plans
    * subject-keyed joins, groupBys and windows WITHOUT their Exchange — at
    * 100 TB that converts every repeated per-subject analytic from a full
    * shuffle into a local scan, and a join between two stores bucketed the
    * same way is fully co-located. Registered as a catalog table
    * (bucketing metadata lives in the metastore, not the parquet files).
    */
  def writeBucketed(storage: DataFrame, tableName: String, buckets: Int = 32): Unit =
    storage
      .write.mode("overwrite")
      .bucketBy(buckets, "measurement_subject")
      .sortBy("measurement_subject", "timestamp")
      .format("parquet")
      .saveAsTable(tableName)

  /** Small-file compaction — the maintenance job every streaming sink
    * eventually needs: micro-batch appends leave one (or more) file per
    * trigger per date, and a year of 1-minute triggers is ~500k files
    * whose open/footer overhead dominates scans long before data size
    * does (the reference's TimescaleDB gets this for free from chunk
    * management; parquet stores must compact).
    *
    * Rewrites only the date partitions with more than `maxFilesPerDate`
    * files — content-identical, re-clustered by [[write]]'s sort, ONE
    * file per rewritten date — into the same directory via a staged
    * swap (write staged → delete old files → rename in). The file set is
    * SNAPSHOTTED before the read and only that exact set is deleted, so
    * a micro-batch landing a new file mid-compaction is left untouched
    * (it simply survives into the next compaction run). The staged dir
    * lives inside the store root (dot-prefixed, invisible to partition
    * discovery), so the move-in is a same-filesystem rename, never a
    * copy. The swap is still not atomic: a reader listing the partition
    * between the deletes and the renames sees the date incomplete for
    * that instant — run compaction in the maintenance window if readers
    * need strict point-in-time counts. Returns the number of compacted
    * date partitions.
    *
    * NOT for stores managed by a Structured Streaming FILE SINK
    * (`writeStream.format("parquet")`): those pin their exact file set
    * in `_spark_metadata`, and log-based reads would throw on the
    * deleted files and never see the compacted ones — guarded with a
    * hard error. [[graft.streaming.IngestPipeline]]'s conditions sinks
    * are foreachBatch writers (no metadata log), so their stores
    * compact fine.
    *
    * Scale shape: the file census is listing metadata only; each
    * compacted date is one narrow read → sort → write of that date's
    * rows. Dates are independent — a 100 TB store compacts incrementally
    * (bound the run with `maxDates`) instead of rewriting the table.
    */
  def compact(spark: SparkSession, path: String, maxFilesPerDate: Int = 8,
              maxDates: Int = Int.MaxValue): Int = {
    require(maxFilesPerDate > 0, "maxFilesPerDate must be positive")
    val root = new java.io.File(path)
    require(!new java.io.File(root, "_spark_metadata").exists(),
      s"$path is managed by a Structured Streaming file sink: its " +
        "_spark_metadata log pins the exact file set, so compaction would " +
        "break log-based reads — compact a foreachBatch-written store, or " +
        "rewrite the table through a batch job instead")
    val dateDirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("date="))
    def parquets(d: java.io.File) =
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    // finish any swap a previous run crashed inside of FIRST: a COMMIT
    // marker means the staged rewrite is complete and the old files are
    // condemned — without this, the next run's mode("overwrite") of the
    // staged dir would destroy the only complete copy of that date's rows
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith(".compact_") &&
        f.getName.endsWith(".COMMIT"))
      .foreach(m => finishSwap(root, m))
    val targets = dateDirs.filter(d => parquets(d).length > maxFilesPerDate)
      .sortBy(_.getName).take(maxDates)
    targets.foreach { d =>
      // snapshot ONCE: read exactly these files, delete exactly these
      // files — a concurrent append between the two is neither lost nor
      // double-counted, it just stays uncompacted until the next run
      val before = parquets(d)
      val staged = new java.io.File(root, s".compact_${d.getName}")
      val marker = new java.io.File(root, s".compact_${d.getName}.COMMIT")
      spark.read.parquet(before.map(_.getAbsolutePath).toSeq: _*)
        .coalesce(1)
        .sortWithinPartitions("measurement_of", "measurement_subject", "timestamp")
        .write.mode("overwrite").parquet(staged.getAbsolutePath)
      // the marker names the condemned snapshot; written only AFTER the
      // staged rewrite succeeded, so marker-present ⇒ staged-complete and
      // a crash anywhere past this point resumes via finishSwap
      java.nio.file.Files.write(marker.toPath,
        before.map(_.getName).sorted.mkString("\n").getBytes("UTF-8"))
      finishSwap(root, marker)
    }
    targets.length
  }

  /** Complete a staged compaction swap: delete the condemned files the
    * marker names (checked — an undeletable old file aborts BEFORE any
    * rename, leaving the staged copy and marker intact for a retry, never
    * a double-counted partition), move the staged files in, then drop the
    * marker and staged dir. Idempotent: already-deleted and already-moved
    * files are skipped, so a crashed run finishes on the next call.
    */
  private def finishSwap(root: java.io.File, marker: java.io.File): Unit = {
    val dateName = marker.getName.stripPrefix(".compact_").stripSuffix(".COMMIT")
    val d = new java.io.File(root, dateName)
    val staged = new java.io.File(root, s".compact_$dateName")
    val condemned = new String(
      java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
      .split("\n").filter(_.nonEmpty)
    condemned.foreach { name =>
      val f = new java.io.File(d, name)
      require(!f.exists() || f.delete(),
        s"compaction could not delete $f — aborting before the staged " +
          s"rename so the partition is never double-counted; the staged " +
          s"copy and $marker remain for a retry")
    }
    val stagedFiles = Option(staged.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).sortBy(_.getName)
    val taken = Option(d.listFiles()).getOrElse(Array.empty)
      .map(_.getName).toSet
    var i = 0
    stagedFiles.foreach { f =>
      while (taken.contains(f"compacted-$i%05d.parquet")) i += 1
      java.nio.file.Files.move(f.toPath,
        new java.io.File(d, f"compacted-$i%05d.parquet").toPath)
      i += 1
    }
    require(marker.delete() || !marker.exists(),
      s"compaction could not remove $marker")
    deleteDir(staged)
  }

  /** Retention policy — the TimescaleDB `drop_chunks` analogue: delete
    * every date partition strictly OLDER than `cutoffDate` (ISO
    * `yyyy-MM-dd`; the cutoff date itself is kept). Dropping a partition
    * directory is a metadata-speed operation exactly like chunk
    * dropping — no rewrite, no scan of surviving data. Returns the
    * dropped partition names (sorted) so a scheduler can log them.
    */
  def dropPartitionsOlderThan(path: String, cutoffDate: String): Seq[String] = {
    require(cutoffDate.matches("""\d{4}-\d{2}-\d{2}"""),
      s"cutoffDate must be yyyy-MM-dd, got $cutoffDate")
    val root = new java.io.File(path)
    // same contract as [[compact]]: a file-sink-managed store pins its
    // file set in _spark_metadata — dropping partitions under the log
    // leaves dangling entries that break log-based reads
    require(!new java.io.File(root, "_spark_metadata").exists(),
      s"$path is managed by a Structured Streaming file sink " +
        "(_spark_metadata present); dropping partitions would break " +
        "log-based reads")
    val dropped = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("date=") &&
        d.getName.stripPrefix("date=") < cutoffDate)
      .sortBy(_.getName)
    dropped.foreach(deleteDir)
    dropped.map(_.getName).toSeq
  }

  private def deleteDir(f: java.io.File): Unit =
    graft.util.FsUtil.deleteRecursively(f)
}
