package graft.tools

import graft.sources.EventsAsConditions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-gate phase probe: splits each composite gate benchmark row
  * (`q_dedup_stream`, `q_embed_neardup_stream`, `q_decontaminate_stream`,
  * `q_ingest_wire`) into its phases — index/state build, input staging,
  * stream drain — and reads per-micro-batch durations from the streaming
  * engine's own progress events, so a regression in the 5–7 s composite
  * bench number is attributable to a specific phase instead of "the gate
  * got slower".
  *
  * Prints one JSON line per gate:
  * `{"gate":…,"build_sec":…,"stage_sec":…,"stream_sec":…,"batches":N,
  *   "batch_ms":[…]}`.
  * `batch_ms` comes from `StreamingQuery.lastProgress`/`recentProgress`
  * (`batchDuration`), i.e. the engine's measurement, not wall-clock
  * arithmetic; `stream_sec` additionally covers stream startup/teardown,
  * so `stream_sec − Σ batch_ms/1000` ≈ fixed per-stream overhead.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.GatePhaseProbe
  */
object GatePhaseProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def drain(q: StreamingQuery): (Double, Seq[Long]) = {
    val (_, sec) = time(q.awaitTermination())
    (sec, q.recentProgress.toSeq.map(_.batchDuration))
  }

  private def emit(gate: String, build: Double, stage: Double,
                   stream: Double, batchMs: Seq[Long]): Unit =
    println(s"""{"gate":"$gate","build_sec":${graft.util.JsonNum.fixed(build)},"stage_sec":${graft.util.JsonNum.fixed(stage)},"stream_sec":${graft.util.JsonNum.fixed(stream)},"batches":${batchMs.length},"batch_ms":[${batchMs.mkString(",")}]}""")

  private def withTempDir(prefix: String)(body: String => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
    try body(tmp)
    finally graft.util.FsUtil.deleteRecursively(new java.io.File(tmp))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // ---- q_dedup_stream: MinHash signature index gate
    withTempDir("gpp_dedup") { tmp =>
      val idxDocs = docs.filter(col("doc_id") % 2 === 0)
      val (_, tBuild) = time(
        graft.operators.Dedup.writeSignatureIndex(idxDocs, "gpp_sig_index"))
      val (_, tStage) = time(
        docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text", "source")
          .repartition(3).write.parquet(s"$tmp/input"))
      val q = graft.streaming.DedupStream.start(spark, s"$tmp/input",
        "gpp_sig_index", idxDocs, s"$tmp/out", s"$tmp/cp",
        maxFilesPerTrigger = Some(1))
      val (tStream, batches) = drain(q)
      emit("q_dedup_stream", tBuild, tStage, tStream, batches)
    }

    // ---- q_embed_neardup_stream: IVF index gate
    withTempDir("gpp_ann") { tmp =>
      val (_, tBuild) = time(graft.operators.Ann.writeIvfIndex(
        embeddings.filter(col("vec_id") % 2 === 0), "gpp_ivf_index", nlist = 16))
      val (_, tStage) = time(
        embeddings.filter(col("vec_id") % 2 === 1).select("vec_id", "embedding")
          .repartition(3).write.parquet(s"$tmp/input"))
      val q = graft.streaming.AnnStream.start(spark, s"$tmp/input",
        "gpp_ivf_index", s"$tmp/out", s"$tmp/cp",
        threshold = 0.45, nProbe = 16, maxFilesPerTrigger = Some(1))
      val (tStream, batches) = drain(q)
      emit("q_embed_neardup_stream", tBuild, tStage, tStream, batches)
    }

    // ---- q_decontaminate_stream: bloom + shingle state built inside
    // start() (synchronously, before the async stream launches), so the
    // start() call itself is the build phase
    withTempDir("gpp_decon") { tmp =>
      val (_, tStage) = time(
        docs.filter(col("doc_id") % 7 =!= 0).select("doc_id", "text", "source")
          .repartition(3).write.parquet(s"$tmp/input"))
      val (q, tBuild) = time(graft.streaming.DecontaminationStream.start(
        spark, s"$tmp/input", docs.filter(col("doc_id") % 7 === 0),
        s"$tmp/out", s"$tmp/cp", n = 5, maxFilesPerTrigger = Some(1)))
      val (tStream, batches) = drain(q)
      emit("q_decontaminate_stream", tBuild, tStage, tStream, batches)
    }

    // ---- q_dedup_simhash_stream: SimHash band-segment index gate (the
    // #1 bench row in round 7, 13.1 s with no split)
    withTempDir("gpp_simhash") { tmp =>
      val (_, tBuild) = time(graft.operators.Dedup.writeSimhashIndex(
        docs.filter(col("doc_id") % 2 === 0), "gpp_sh_index"))
      val (_, tStage) = time(
        docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text", "source")
          .repartition(3).write.parquet(s"$tmp/input"))
      val q = graft.streaming.DedupStream.startSimhash(spark, s"$tmp/input",
        "gpp_sh_index", s"$tmp/out", s"$tmp/cp", maxFilesPerTrigger = Some(1))
      val (tStream, batches) = drain(q)
      emit("q_dedup_simhash_stream", tBuild, tStage, tStream, batches)
    }

    // ---- q_line_dedup_stream: line-claim index gate (probe cost only,
    // so the raw documents stand in for the gate's planted-lines corpus)
    withTempDir("gpp_lines") { tmp =>
      val (_, tBuild) = time(graft.operators.Dedup.writeLineIndex(
        docs.filter(col("doc_id") % 2 === 0), "gpp_line_index"))
      val (_, tStage) = time(
        docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text")
          .repartition(3).write.parquet(s"$tmp/input"))
      val q = graft.streaming.DedupStream.startLines(spark, s"$tmp/input",
        "gpp_line_index", s"$tmp/out", s"$tmp/cp", maxFilesPerTrigger = Some(1))
      val (tStream, batches) = drain(q)
      emit("q_line_dedup_stream", tBuild, tStage, tStream, batches)
    }

    // ---- q_media_stream: media signature index gate
    withTempDir("gpp_media") { tmp =>
      val media = graft.operators.Multimodal.fromDocuments(
        docs.select("doc_id", "text", "n_chars"))
      val (_, tBuild) = time(graft.operators.Multimodal.writeMediaIndex(
        media.filter(col("id") % 2 === 0), "gpp_media_index"))
      val (_, tStage) = time(
        media.filter(col("id") % 2 === 1).select("id", "content")
          .repartition(3).write.parquet(s"$tmp/input"))
      val q = graft.streaming.DedupStream.startMedia(spark, s"$tmp/input",
        "gpp_media_index", s"$tmp/out", s"$tmp/cp", maxFilesPerTrigger = Some(1))
      val (tStream, batches) = drain(q)
      emit("q_media_stream", tBuild, tStage, tStream, batches)
    }

    // ---- q_url_stream: URL-frontier claims gate (exact canonical
    // probe, no verify step — per-batch cost is one co-partitioned
    // anti-join against the bucketed claims table)
    withTempDir("gpp_url") { tmp =>
      val urls = docs.select(col("doc_id"),
        concat(lit("https://h"), (col("doc_id") % 1000).cast("string"),
          lit(".example.com/p/"), col("doc_id").cast("string")).as("url"))
      val (_, tBuild) = time(graft.operators.UrlOps.writeUrlIndex(
        urls.filter(col("doc_id") % 2 === 0), "url", "gpp_url_index"))
      val (_, tStage) = time(
        urls.repartition(3).write.parquet(s"$tmp/input"))
      val q = graft.streaming.DedupStream.startUrls(spark, s"$tmp/input",
        "gpp_url_index", s"$tmp/out", s"$tmp/cp", maxFilesPerTrigger = Some(1))
      val (tStream, batches) = drain(q)
      emit("q_url_stream", tBuild, tStage, tStream, batches)
    }

    // ---- q_quality_stream: persisted NB model gate
    withTempDir("gpp_quality") { tmp =>
      val (_, tBuild) = time(graft.operators.QualityModels.writeNbModel(
        docs.filter(col("doc_id") % 5 =!= 0), col("lang") === "en",
        "gpp_nb_model"))
      val (_, tStage) = time(
        docs.filter(col("doc_id") % 5 === 0).select("doc_id", "text", "lang")
          .repartition(3).write.parquet(s"$tmp/input"))
      val q = graft.streaming.QualityStream.start(spark, s"$tmp/input",
        "gpp_nb_model", s"$tmp/out", s"$tmp/cp", maxFilesPerTrigger = Some(1))
      val (tStream, batches) = drain(q)
      emit("q_quality_stream", tBuild, tStage, tStream, batches)
    }

    // ---- q_vocab_stream: vocab partial-append gate (empty seed index)
    withTempDir("gpp_vocab") { tmp =>
      val (_, tBuild) = time(graft.operators.TextAnalysis.writeVocabIndex(
        docs.filter(lit(false)), "gpp_vocab_index"))
      val (_, tStage) = time(
        docs.select("doc_id", "text").repartition(3).write.parquet(s"$tmp/input"))
      val q = graft.streaming.CorpusStatsStream.start(spark, s"$tmp/input",
        "gpp_vocab_index", s"$tmp/cp", maxFilesPerTrigger = Some(1))
      val (tStream, batches) = drain(q)
      emit("q_vocab_stream", tBuild, tStage, tStream, batches)
    }

    // ---- q_cagg_streamed: stream-maintained rollup gate (three ordered
    // slices, each its own AvailableNow run — batches aggregate across
    // the three drains)
    withTempDir("gpp_cagg") { tmp =>
      val events = EventsAsConditions.load(spark, sfDir)
      var tStage = 0.0
      var tStream = 0.0
      var batches = Seq.empty[Long]
      Seq(0, 1, 2).foreach { slice =>
        val (_, st) = time(
          events.filter(pmod(col("timestamp").cast("long"), lit(3)) === slice)
            .coalesce(1).write.mode("append").parquet(s"$tmp/input"))
        tStage += st
        val q = graft.streaming.CaggStream.start(spark, s"$tmp/input",
          s"$tmp/store", s"$tmp/agg", s"$tmp/cp", widthS = 3600)
        val (ts, b) = drain(q)
        tStream += ts
        batches = batches ++ b
      }
      emit("q_cagg_streamed", 0.0, tStage, tStream, batches)
    }

    // ---- q_ingest_wire: two-hop topology — convert stage and storage
    // stage are each their own streaming query (reported as two rows)
    withTempDir("gpp_wire") { tmp =>
      val envelopes = EventsAsConditions.loadEvents(spark, sfDir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(format_string(
          """{"topic": "emon/emonTx4", "payload": "{\"P1\": %s, \"time\": %.6f}", "qos": 0, "retain": 0, "timestamp": 0}""",
          col("value"), unix_micros(col("ts")) / 1e6).as("raw"))
      val (_, tStage) = time(envelopes.write.text(s"$tmp/input"))
      val qc = graft.streaming.IngestPipeline.startConvertToWire(
        spark, s"$tmp/input", s"$tmp/wire", s"$tmp/cp_convert")
      val (tConvert, bConvert) = drain(qc)
      val qs = graft.streaming.IngestPipeline.startWire(
        spark, s"$tmp/wire", s"$tmp/out", s"$tmp/cp_store")
      val (tStore, bStore) = drain(qs)
      emit("q_ingest_wire/convert", 0.0, tStage, tConvert, bConvert)
      emit("q_ingest_wire/store", 0.0, 0.0, tStore, bStore)
    }

    spark.stop()
  }
}
