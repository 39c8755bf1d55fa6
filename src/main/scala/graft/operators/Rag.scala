package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval pipeline composition — the serving shape a RAG corpus runs:
  * overlapping chunking → per-chunk embedding → top-k cosine retrieval
  * for a free-text query. Every stage is an already-gated operator
  * ([[Packing.chunkDocuments]], [[TextAnalysis.hashEmbed]],
  * [[Ann.topK]]); this composes them end to end under ONE oracle, the
  * same capstone treatment the curation/export pipelines get.
  *
  * The chunk key packs (doc_id, chunk_id) into one BIGINT
  * (`doc_id·10⁵ + chunk_id`, chunk counts enforced < 10⁵ — the
  * [[Dedup.lineDedup]] packing recipe) so the chunk table drops into the
  * vec_id-keyed ANN family unchanged; the query embeds as key −1, which
  * can never collide. At scale the brute-force top-k swaps for the
  * persisted IVF tier ([[Ann.writeIvfIndex]]) with no change to the
  * chunk/embed stages.
  */
object Rag {

  def retrieveChunks(docs: DataFrame, queryText: String, k: Int,
                     maxTokens: Int = 64, overlap: Int = 8,
                     dim: Int = 32): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(queryText.nonEmpty, "query must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = Packing.chunkDocuments(docs, maxTokens, overlap)
      .select(
        when(col("chunk_id") < 100000L, col("doc_id") * 100000L + col("chunk_id"))
          .otherwise(raise_error(lit("retrieveChunks: document with ≥1e5 chunks")))
          .as("doc_id"),
        col("chunk_text").as("text"))
    val corpus = TextAnalysis.hashEmbed(chunks, dim)
      .withColumnRenamed("doc_id", "vec_id")
    val qe = TextAnalysis.hashEmbed(
        Seq((-1L, queryText)).toDF("doc_id", "text"), dim)
      .withColumnRenamed("doc_id", "vec_id")
    Ann.topK(corpus.unionByName(qe), queryId = -1L, k = k + 1)
      .filter(col("vec_id") =!= -1L)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select(expr("vec_id div 100000").as("doc_id"),
        (col("vec_id") % 100000L).as("chunk_id"), col("cos"))
  }

  /** Document-level retrieval: the same chunk → embed pipeline, then
    * chunk vectors MEAN-POOLED per document ([[Ann.meanPoolEmbeddings]])
    * and the query scored against one vector per doc — the serving shape
    * when the unit of retrieval is the document, with the pooled store
    * k× smaller than the chunk store. Zero-norm chunks (possible under
    * signed-hash cancellation) are excluded from the mean, mirroring the
    * normalize-then-drop contract of the chunk tier.
    */
  def retrieveDocs(docs: DataFrame, queryText: String, k: Int,
                   maxTokens: Int = 64, overlap: Int = 8,
                   dim: Int = 32): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(queryText.nonEmpty, "query must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = Packing.chunkDocuments(docs, maxTokens, overlap)
      .select(
        when(col("chunk_id") < 100000L, col("doc_id") * 100000L + col("chunk_id"))
          .otherwise(raise_error(lit("retrieveDocs: document with ≥1e5 chunks")))
          .as("doc_id"),
        col("chunk_text").as("text"))
    val corpus = TextAnalysis.hashEmbed(chunks, dim)
      .withColumnRenamed("doc_id", "vec_id")
      .filter(expr("aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * x) > 0"))
    val pooled = Ann.meanPoolEmbeddings(
        corpus.withColumn("gid", expr("vec_id div 100000")), "gid")
      .select(col("gid").as("vec_id"),
        expr("transform(embedding, x -> CAST(x AS FLOAT))").as("embedding"))
    val qe = TextAnalysis.hashEmbed(
        Seq((-1L, queryText)).toDF("doc_id", "text"), dim)
      .withColumnRenamed("doc_id", "vec_id")
    Ann.topK(pooled.unionByName(qe), queryId = -1L, k = k + 1)
      .filter(col("vec_id") =!= -1L)
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id").as("doc_id"), col("cos"))
  }
}
