package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * treated as opaque `binary` columns with typed metadata, processed in
  * partition-sized batches.
  *
  * The Spark-side plumbing here — schema, binary transport, batched
  * `mapPartitions` execution, byte-budget repartitioning — is real and
  * tested. The actual media decoding is STUBBED: this container has no
  * image/audio codecs, so [[MediaDecoder.Real]] throws and the pipeline
  * runs with [[MediaDecoder.Fake]], a deterministic byte-level feature
  * extractor whose outputs are oracle-checkable. Swapping in a real codec
  * is a one-object change; nothing in the plan shape moves.
  *
  * Scale notes: media rows are large (MBs); the operators below
  * repartition by an explicit byte budget (`targetPartitionBytes`) rather
  * than row count, so a 100 TB corpus with skewed asset sizes still
  * produces balanced executor-sized partitions. Feature extraction is a
  * narrow per-partition pass — no shuffle until the (tiny) feature output.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int,
                             durationMs: Long, format: String)
  final case class MediaRow(id: Long, modality: String, content: Array[Byte],
                            meta: MediaMeta)
  final case class MediaFeatures(id: Long, modality: String, n_bytes: Long,
                                 byte_sum: Long, byte_mean: Double)

  /** The decode seam. */
  sealed trait MediaDecoder extends Serializable {
    def features(content: Array[Byte]): (Long, Long, Double)
  }
  object MediaDecoder {
    /** Real codecs are not available in this environment. */
    case object Real extends MediaDecoder {
      def features(content: Array[Byte]): (Long, Long, Double) =
        throw new NotImplementedError(
          "media codecs (image/audio/video) are not present in this container; " +
          "use MediaDecoder.Fake — the pipeline shape is identical")
    }
    /** Deterministic stand-in: byte-level stats (exact, oracle-checkable). */
    case object Fake extends MediaDecoder {
      def features(content: Array[Byte]): (Long, Long, Double) = {
        var sum = 0L
        var i = 0
        while (i < content.length) { sum += content(i) & 0xff; i += 1 }
        (content.length.toLong, sum % 9973L,
          if (content.length == 0) 0.0 else sum.toDouble / content.length)
      }
    }
  }

  /** Synthesize a media table from the documents table (content = UTF-8
    * bytes, modality round-robins image/audio/video, metadata derived
    * deterministically). Stands in for a real asset store at test scale.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (col("n_chars") % 1920).cast("int").as("width"),
        (col("n_chars") % 1080).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (col("n_chars") * 10L).as("durationMs"),
        lit("stub").as("format")).as("meta"))

  /** Repartition a media table so each partition holds roughly
    * `targetPartitionBytes` of content — size-aware, not row-count-aware.
    */
  def repartitionByBytes(media: DataFrame, targetPartitionBytes: Long): DataFrame = {
    val row = media.agg(sum(length(col("content")))).collect()(0)
    val totalBytes = if (row.isNullAt(0)) 0L else row.getLong(0) // empty table
    val parts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    media.repartition(parts)
  }

  /** Batched feature extraction: one decoder instance per partition, one
    * pass over the rows (the mapInPandas/Arrow-batch shape, Scala-typed).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      decoder: MediaDecoder = MediaDecoder.Fake): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, modality, content) =>
          val (n, s, m) = decoder.features(content)
          MediaFeatures(id, modality, n, s, m)
        }
      }
  }

  /** 64-bit average-hash (aHash) perceptual signature of a byte stream —
    * the classic image near-dup sketch (resize to 8×8, threshold each
    * cell against the global mean), expressed over the opaque content
    * bytes: byte i maps to cell `i*64/n` (the "resize"), bit g is set iff
    * cell g's mean exceeds the stream mean. The comparison is the exact
    * integer cross-multiply `sum_g·n > total·cnt_g` — no floating point,
    * so the DuckDB oracle replays the bits exactly. Cells are empty only
    * when n < 64 (bit stays 0). Safe from Long overflow up to ~190 MB
    * per asset (255·n² < 2⁶³).
    *
    * With a REAL image decoder this would hash decoded luma instead of
    * raw bytes; the sketch, banding, and pair machinery are unchanged —
    * the decode seam is the same one [[extractFeatures]] stubs.
    */
  private[operators] def aHash64(content: Array[Byte]): Long = {
    val n = content.length
    if (n == 0) return 0L
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val v = (content(i) & 0xff).toLong
      val g = (i.toLong * 64 / n).toInt
      sums(g) += v; cnts(g) += 1; total += v
      i += 1
    }
    var sig = 0L
    var g = 0
    while (g < 64) {
      if (cnts(g) > 0 && sums(g) * n > total * cnts(g)) sig |= (1L << g)
      g += 1
    }
    sig
  }

  private val aHashUdf = udf((content: Array[Byte]) => aHash64(content))

  /** Per-asset aHash signatures: (doc_id, simhash) — column names chosen
    * to feed [[Dedup.sigPairs]] directly. Map-only over the media scan.
    */
  def aHashSigs(media: DataFrame): DataFrame =
    media.select(col("id").as("doc_id"), aHashUdf(col("content")).as("simhash"))

  /** Media near-duplicate pairs: assets whose aHash signatures differ in
    * ≤ `maxHamming` bits — re-encoded/lightly-edited copies of the same
    * underlying asset. Candidates come from [[Dedup.sigPairs]]'s
    * pigeonhole banding (exact, no all-pairs scan); at 100 TB the sketch
    * pass is map-only over the (heavy) media scan and everything after
    * operates on 16-byte signature rows.
    */
  def mediaNearDupPairs(media: DataFrame, maxHamming: Int = 4): DataFrame =
    Dedup.sigPairs(aHashSigs(media), maxHamming)
      .toDF("id_a", "id_b", "hamming")

  /** Persisted media near-dup index — the asset-catalog shape: aHash
    * signatures banded and bucket-stored once ([[Dedup.writeSigIndex]]),
    * so a new media drop probes the accumulated catalog without
    * re-hashing a byte of it. The signature IS the verification evidence
    * (Hamming on stored sigs), so per-batch cost is the new drop's sketch
    * pass (the only touch of heavy media bytes) plus a co-partitioned
    * bucket join over 16-byte rows.
    */
  def writeMediaIndex(media: DataFrame, tableName: String,
                      buckets: Int = 64, maxHamming: Int = 4): Unit =
    Dedup.writeSigIndex(aHashSigs(media), tableName, buckets, maxHamming)

  def appendToMediaIndex(media: DataFrame, tableName: String): Unit =
    Dedup.appendToSigIndex(aHashSigs(media), tableName)

  /** New assets within `maxHamming` of any indexed asset —
    * (id_new, id_index, hamming). `maxHamming` validated against the
    * index's write-time property (banding geometry must match).
    */
  def mediaNearDupAgainstIndex(newMedia: DataFrame, indexTable: String,
                               maxHamming: Int = 4): DataFrame =
    Dedup.sigPairsAgainstIndex(aHashSigs(newMedia), indexTable, maxHamming)
      .toDF("id_new", "id_index", "hamming")

  /** Frame/chunk sampling: every `stride`-th fixed-size block of the
    * content — the frame-sample plan shape with the codec stubbed out
    * (a real video decoder replaces `grabBlock`).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameSize: Int = 256, stride: Int = 4): DataFrame = {
    import spark.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, content) =>
        def grabBlock(f: Int): Array[Byte] =
          content.slice(f * frameSize, math.min((f + 1) * frameSize, content.length))
        val nFrames = math.max(0, (content.length + frameSize - 1) / frameSize)
        (0 until nFrames by stride).map(f => (id, f, grabBlock(f)))
      }
      .toDF("id", "frame_idx", "frame")
  }
}
