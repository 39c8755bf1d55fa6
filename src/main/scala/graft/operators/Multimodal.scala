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
