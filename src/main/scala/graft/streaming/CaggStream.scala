package graft.streaming

import graft.sources.ContinuousAggregate
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming-driven continuous-aggregate maintenance — the production
  * loop a live conditions store runs: each micro-batch appends to the
  * raw date-partitioned store, then refreshes the materialized rollup
  * for every date the batch touched (the TimescaleDB refresh-policy
  * shape, triggered by data arrival instead of a timer). The SEVENTH
  * external-state family to gate streams: the state is the rollup table
  * itself.
  *
  * Refresh recomputes dates ≥ the batch's min date from the FULL store,
  * so late rows inside a batch fold in correctly and a replayed batch is
  * idempotent for the rollup (the raw append stays at-least-once, the
  * usual foreachBatch caveat — an idempotent keyed sink upgrades it).
  * Per-batch cost ∝ the days the batch touches, never the store's age.
  */
object CaggStream {

  /** One-time migration of a LEGACY flat raw store (written before the
    * store became date-partitioned) into the `date=` layout: Spark's
    * partition discovery fails on a directory mixing root-level parquet
    * files with `date=` subdirectories, so resuming a pre-partitioning
    * checkpointed stream would otherwise break on its first batch.
    *
    * Crash-safe protocol (single writer — [[start]]'s foreachBatch is
    * the only store writer by contract):
    *  1. rename every root-level data file into a `.legacy_migration/`
    *    quarantine dir (per-file rename; a crash mid-way leaves a mix
    *    that the next start() finishes moving — reads never see root
    *    files and quarantine files double-counted, because neither side
    *    is under `date=` yet);
    *  2. append the quarantined rows under their date partitions (a
    *    crash mid-job leaves only uncommitted `_temporary` output — the
    *    committer publishes files at job commit, so a re-run re-appends
    *    from quarantine without duplicates);
    *  3. write a `_MIGRATED` marker in the quarantine, then delete the
    *    quarantine (a crash after the marker ⇒ next start() just
    *    cleans up — UNLESS new flat files have appeared at the root, in
    *    which case the stale marker is discarded and the migration
    *    re-runs from step 1 for those files; without the marker ⇒ next
    *    start() re-runs step 2);
    *  4. refresh the rollup for the dates the migration touched (the
    *    migrated rows are historical, so no future batch's
    *    dates-≥-min-date refresh may ever reach them — without this the
    *    raw store would hold rows the rollup never serves).
    * The remaining exposures: the instant between job commit and marker
    * creation (closing it needs a transactional table format, which the
    * parquet store deliberately is not); a crash between marker and
    * step 4's refresh (rollup stale for the migrated dates until a
    * refresh reaches them); and a legacy writer appending DURING this
    * run, after the root listing — that run's first batch fails on the
    * mixed layout and the next start() migrates the straggler.
    */
  private def migrateLegacyFlatStore(spark: SparkSession, storePath: String,
                                     aggPath: String, widthS: Long): Unit = {
    val path = new org.apache.hadoop.fs.Path(storePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return
    val quarantine = new org.apache.hadoop.fs.Path(path, ".legacy_migration")
    val marker = new org.apache.hadoop.fs.Path(quarantine, "_MIGRATED")
    val rootFiles = fs.listStatus(path)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (rootFiles.isEmpty && !fs.exists(quarantine)) return
    if (fs.exists(marker)) {
      // a completed migration whose quarantine cleanup didn't happen —
      // BUT only short-circuit when the root is clean: a rolled-back
      // legacy writer can append NEW flat files after the marker was
      // written, and honoring the stale marker then would leave the
      // mixed root-parquet + date= layout in place for this run. The
      // delete removes the marker with the quarantine, so the
      // fall-through below re-quarantines the new files from scratch.
      val cleaned = fs.delete(quarantine, true)
      if (rootFiles.isEmpty) return // failed delete harmless here: retried next start()
      // falling through with a surviving quarantine would re-append its
      // ALREADY-MIGRATED files alongside the new ones (step 2 reads the
      // whole quarantine) — permanent duplicate rows; abort instead
      if (!cleaned || fs.exists(quarantine))
        throw new IllegalStateException(
          s"cagg store migration: cannot clear stale quarantine $quarantine; " +
            "store left as-is for retry")
    }
    if (rootFiles.nonEmpty) {
      if (!fs.mkdirs(quarantine))
        throw new IllegalStateException(s"cagg store migration: cannot create quarantine $quarantine")
      // A false return (dest exists, FS refused the move) must ABORT the
      // migration: proceeding would leave a root-level file behind while
      // still writing the _MIGRATED marker below — exactly the mixed
      // root-files + date= layout this migration exists to prevent. The
      // throw leaves the store pre-marker, so the next start() retries.
      rootFiles.foreach { s =>
        val dest = new org.apache.hadoop.fs.Path(quarantine, s.getPath.getName)
        if (!fs.rename(s.getPath, dest))
          throw new IllegalStateException(
            s"cagg store migration: rename ${s.getPath} -> $dest failed; store left pre-marker for retry")
      }
    }
    val pending = fs.listStatus(quarantine)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val touchedDates = if (pending.isEmpty) Array.empty[java.sql.Date] else {
      val migrated = spark.read.parquet(pending.map(_.getPath.toString).toSeq: _*)
        .withColumn("date", to_date(col("timestamp")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        migrated.write.mode("append").partitionBy("date").parquet(storePath)
        // bounded by the legacy store's distinct DAYS, not its rows
        migrated.select("date").distinct().collect().map(_.getDate(0))
      } finally { migrated.unpersist(); () }
    }
    fs.create(marker, true).close()
    fs.delete(quarantine, true)
    // step 4: the migrated rows are historical, so foreachBatch's
    // dates-≥-batch-min refresh may never reach their dates — refresh
    // them here (post-marker: a crash before this leaves the rollup
    // stale, never the raw store duplicated). Dynamic partition
    // overwrite rewrites exactly the touched dates; recompute reads only
    // those date directories (partition pruning on the isin filter).
    if (touchedDates.nonEmpty) {
      val md = touchedDates.min(Ordering.by((d: java.sql.Date) => d.toString)).toString
      ContinuousAggregate.refresh(
        spark.read.parquet(storePath).filter(col("date").isin(touchedDates.toSeq: _*)),
        aggPath, widthS, md)
    }
    ()
  }

  def start(spark: SparkSession, inputDir: String, storePath: String,
            aggPath: String, checkpointDir: String, widthS: Long,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    migrateLegacyFlatStore(spark, storePath, aggPath, widthS)
    val schema = spark.read.parquet(inputDir).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputDir)
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.toDF().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // the raw store is DATE-PARTITIONED like the rollup, so the
          // refresh below reads only the touched date directories
          // (partition pruning on the filter) — per-batch cost ∝ the
          // days the batch touches, never the store's age
          b.withColumn("date", to_date(col("timestamp")))
            .write.mode("append").partitionBy("date").parquet(storePath)
          val minDate = b.agg(min(to_date(col("timestamp")))).head()
          if (!minDate.isNullAt(0)) {
            val md = minDate.getDate(0).toString
            ContinuousAggregate.refresh(
              spark.read.parquet(storePath).filter(col("date") >= lit(md)),
              aggPath, widthS, md)
          }
        } finally { b.unpersist(); () }
      }
      .start()
  }
}
