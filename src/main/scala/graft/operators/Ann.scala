package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two tiers:
  *  - brute-force cosine ([[topK]], [[neardupPairs]]) — the exact baseline
  *    and the oracle;
  *  - random-hyperplane LSH bucketing ([[lshNeardupPairs]]) — the scale
  *    path: cosine-similar vectors share sign patterns, so candidate
  *    generation is a bucket join instead of an O(n²) cross join;
  *    candidates are verified with the exact cosine, so precision is 1.
  *
  * Kernel choice: the dot/norm kernels are compiled Scala UDFs over
  * primitive arrays, NOT `zip_with`+`aggregate` — Spark's higher-order
  * array functions evaluate interpreted (CodegenFallback, per-element
  * boxing), which measured ~100× slower in the all-pairs join. The UDFs
  * fold left-to-right in double, bit-identical to DuckDB's
  * `list_sum(list_transform(...))` oracle.
  *
  * Scale notes: norms are computed once per row (not per pair); the pair
  * generator repartitions the streamed side so the nested-loop join
  * parallelizes across all cores instead of one task.
  */
object Ann {

  private def dotD(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private val dotUdf = udf((a: Seq[Float], b: Seq[Float]) => dotD(a, b))
  private val normUdf = udf((a: Seq[Float]) => math.sqrt(dotD(a, a)))

  /** Embeddings with a precomputed L2 norm column. */
  def withNorm(embeddings: DataFrame): DataFrame =
    embeddings.withColumn("nrm", normUdf(col("embedding")))

  /** Brute-force top-k by cosine against the embedding of `queryId`.
    * The 1-row query side is broadcast; the scan stays a single pass.
    */
  def topK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dotUdf(col("embedding"), col("qe")) / (col("nrm") * col("qn")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Exact near-duplicate pairs: all (a<b) with cosine ≥ threshold.
    * O(n²) — the correctness oracle; use [[lshNeardupPairs]] at scale.
    * The left side is repartitioned so the nested-loop parallelizes.
    */
  def neardupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = withNorm(embeddings)
    val parallelism = embeddings.sparkSession.sparkContext.defaultParallelism
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"), col("nrm").as("na"))
      .repartition(parallelism)
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos", dotUdf(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy("id_a", "id_b")
  }

  /** Deterministic random hyperplanes: `tables` independent sign-sketches
    * of `bits` hyperplanes each (seeded).
    */
  private def hyperplanes(dim: Int, bits: Int, tables: Int): Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(4242)
    Array.fill(tables, bits, dim)(rng.nextGaussian())
  }

  /** LSH near-dup pairs: candidates collide in ≥1 of `tables` sign-sketch
    * buckets, then exact-cosine verified. Recall ≈ 1-(1-(1-θ/π)^bits)^tables.
    */
  def lshNeardupPairs(embeddings: DataFrame, threshold: Double,
                      dim: Int = 64, bits: Int = 12, tables: Int = 6): DataFrame = {
    val hp = hyperplanes(dim, bits, tables)
    val sketchUdf = udf { (v: Seq[Float]) =>
      hp.map { planes =>
        var bucket = 0L
        var j = 0
        while (j < planes.length) {
          var s = 0.0
          val p = planes(j)
          var i = 0
          val n = math.min(v.length, p.length)
          while (i < n) { s += v(i).toDouble * p(i); i += 1 }
          if (s >= 0) bucket |= (1L << j)
          j += 1
        }
        bucket
      }.toSeq
    }
    val buckets = withNorm(embeddings)
      .withColumn("sk", sketchUdf(col("embedding")))
      .select(col("vec_id"), col("embedding"), col("nrm"), posexplode(col("sk")))
      .toDF("vec_id", "embedding", "nrm", "table", "bucket")
    val l = buckets.select(col("table"), col("bucket"),
      col("vec_id").as("id_a"), col("embedding").as("ea"), col("nrm").as("na"))
    val r = buckets.select(col("table"), col("bucket"),
      col("vec_id").as("id_b"), col("embedding").as("eb"), col("nrm").as("nb"))
    l.join(r, Seq("table", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ea", "eb", "na", "nb").distinct()
      .withColumn("cos", dotUdf(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy("id_a", "id_b")
  }
}
