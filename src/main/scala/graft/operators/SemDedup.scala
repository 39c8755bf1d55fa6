package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication over an embedding column (Abbas et
  * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication"): cluster the embedding space, then search for
  * near-duplicate pairs only WITHIN clusters, so the quadratic pair cost
  * is bounded by the largest cluster instead of the corpus
  * (Σ|cluster|² ≪ n² — the paper's web-scale argument; choose the
  * cluster count ∝ n / target-cluster-size to keep every cluster
  * task-sized).
  *
  * Pipeline: max-cosine centroid assignment (broadcast centroids, one
  * narrow pass) → per-cluster exact pairwise cosine via the packed
  * block-triangle kernel ([[Ann.neardupPairs]]'s design, keyed by
  * cluster) → connected components of the pair graph
  * ([[Clustering.connectedComponents]]) → keep the minimum-id member of
  * each duplicate group. The min-id keep rule is deterministic and
  * engine-replayable; the paper's "farthest from centroid" variant is a
  * one-line swap of the representative choice and changes none of the
  * scale structure.
  *
  * Centroids come from the caller: [[trainedCentroids]] (seeded k-means
  * over a bounded sample — the production path) or any deterministic seed
  * set (the contract/oracle path uses fixed corpus vectors, making the
  * whole pipeline — assignment included — exactly replayable in SQL).
  */
object SemDedup {

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Production centroid training: seeded Lloyd's k-means over a bounded
    * uniform sample (cost independent of corpus size), returned as the
    * (list_id, centroid) frame [[semDedup]] consumes. Centroids are
    * Float vectors — the mean is computed in double and truncated once,
    * matching the storage dtype of the corpus.
    */
  def trainedCentroids(embeddings: DataFrame, nlist: Int,
                       sampleSize: Int = 65536): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val sample = Ann.uniformSample(embeddings, sampleSize).map(_._2)
    val cents = Ann.trainCentroids(sample, nlist, iters = 10)
    cents.zipWithIndex
      .map { case (c, i) => (i.toLong, c.map(_.toFloat)) }
      .toSeq.toDF("list_id", "centroid")
  }

  /** The centroids of a persisted [[Ann.writeIvfIndex]] /
    * [[Ann.writeIvfSq8Index]] table, as the (list_id, centroid) frame
    * [[semDedup]] consumes — so a corpus that already maintains an IVF
    * index runs SemDeDup against the SAME partitioning it serves ANN
    * from, for free (no second training pass, and the dedup clusters
    * line up with the index's `ivf_list` layout).
    */
  def centroidsFromIvfIndex(spark: org.apache.spark.sql.SparkSession,
                            tableName: String): DataFrame =
    spark.table(s"${tableName}_centroids")
      .select(col("ivf_list").cast("long").as("list_id"),
        col("centroid").cast("array<float>").as("centroid"))

  /** Max-cosine centroid assignment: (vec_id, embedding, list_id), ties
    * broken toward the LOWEST list_id (strict-greater scan in ascending
    * list order — the oracle replays it as ORDER BY cos DESC, list_id
    * ASC). Centroids are driver-collected (cluster count is bounded by
    * design) and broadcast inside the UDF closure; the pass is narrow —
    * no shuffle.
    *
    * Fails loudly on dimension mismatch and zero-norm centroids (the
    * [[Ann]] error contract); zero-norm corpus vectors would yield NaN
    * cosines everywhere, so they are rejected too.
    */
  def assignToCentroids(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = centroids
      .select(col("list_id").cast("long"), col("centroid"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    require(cents.nonEmpty, "centroids must be non-empty")
    val dim = cents.head._2.length
    require(cents.forall(_._2.length == dim),
      s"centroid dimensions differ (expected $dim)")
    val norms = cents.map { case (_, c) => math.sqrt(dot(c, c)) }
    require(norms.forall(_ > 0), "zero-norm centroid")
    val ids = cents.map(_._1)
    val vecs = cents.map(_._2)
    val assign = udf { (v: Array[Float]) =>
      require(v.length == dim,
        s"embedding dim ${v.length} != centroid dim $dim")
      val nv = math.sqrt(dot(v, v))
      require(nv > 0, "zero-norm embedding")
      var best = 0
      var bestCos = Double.NegativeInfinity
      var i = 0
      while (i < vecs.length) {
        val c = dot(v, vecs(i)) / (nv * norms(i))
        if (c > bestCos) { bestCos = c; best = i }
        i += 1
      }
      ids(best)
    }
    embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("list_id", assign(col("embedding")))
  }

  /** Within-cluster near-duplicate pairs: the packed block-triangle
    * kernel keyed by cluster — blocks are id-hash groups INSIDE one
    * cluster, cells are the per-cluster upper triangle, so no pair ever
    * crosses a cluster boundary and each task's arithmetic is one
    * block×block rectangle of compiled dot products. Returns
    * (id_a < id_b, cos ≥ threshold, rounded 6 dp).
    */
  def withinClusterPairs(assigned: DataFrame, threshold: Double,
                         numBlocks: Int = 0): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val B = if (numBlocks > 0) numBlocks else math.max(1, math.ceil(math.sqrt(par.toDouble)).toInt)
    val packed = assigned.select(col("list_id"), col("vec_id"), col("embedding"))
      .as[(Long, Long, Array[Float])]
      .groupByKey { case (list, id, _) => (list, (((id % B) + B) % B).toInt) }
      .mapGroups { (key: (Long, Int), it: Iterator[(Long, Long, Array[Float])]) =>
        val arr = it.map { case (_, id, v) => (id, v) }.toArray.sortBy(_._1)
        (key._1, key._2, arr.map(_._1), arr.map(_._2),
          arr.map(t => math.sqrt(dot(t._2, t._2))))
      }
      .toDF("list_id", "blk", "ids", "vecs", "nrms")
    val lists = packed.select("list_id").distinct()
    val tri = (for { a <- 0 until B; b <- a until B } yield (a, b)).toDF("blk_a", "blk_b")
    lists.crossJoin(tri)
      .join(packed.select(col("list_id"), col("blk").as("blk_a"), col("ids").as("ids_a"),
        col("vecs").as("vecs_a"), col("nrms").as("nrms_a")), Seq("list_id", "blk_a"))
      .join(packed.select(col("list_id"), col("blk").as("blk_b"), col("ids").as("ids_b"),
        col("vecs").as("vecs_b"), col("nrms").as("nrms_b")), Seq("list_id", "blk_b"))
      .repartition(col("list_id"), col("blk_a"), col("blk_b"))
      .select("blk_a", "blk_b", "ids_a", "vecs_a", "nrms_a", "ids_b", "vecs_b", "nrms_b")
      .as[(Int, Int, Array[Long], Array[Array[Float]], Array[Double],
           Array[Long], Array[Array[Float]], Array[Double])]
      .flatMap { case (ba, bb, idsA, vecsA, nrmsA, idsB, vecsB, nrmsB) =>
        val out = Vector.newBuilder[(Long, Long, Double)]
        if (ba == bb) {
          var i = 0
          while (i < idsA.length) {
            var j = i + 1
            while (j < idsA.length) {
              val cos = dot(vecsA(i), vecsA(j)) / (nrmsA(i) * nrmsA(j))
              if (cos >= threshold) out += ((idsA(i), idsA(j), cos))
              j += 1
            }
            i += 1
          }
        } else {
          var i = 0
          while (i < idsA.length) {
            var j = 0
            while (j < idsB.length) {
              val cos = dot(vecsA(i), vecsB(j)) / (nrmsA(i) * nrmsB(j))
              if (cos >= threshold) {
                if (idsA(i) < idsB(j)) out += ((idsA(i), idsB(j), cos))
                else out += ((idsB(j), idsA(i), cos))
              }
              j += 1
            }
            i += 1
          }
        }
        out.result()
      }
      .toDF("id_a", "id_b", "cos")
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Full SemDeDup: every corpus vector labeled with its cluster, its
    * duplicate-group component (min member id; singleton = itself), and
    * the keep/drop verdict. `keep` = the vector IS its group's minimum
    * id — exactly one survivor per duplicate group.
    */
  def semDedup(embeddings: DataFrame, centroids: DataFrame, threshold: Double,
               numBlocks: Int = 0): DataFrame = {
    val assigned = assignToCentroids(embeddings, centroids)
    val pairs = withinClusterPairs(assigned, threshold, numBlocks)
    Clustering.assignComponents(
        assigned.select("vec_id"), pairs, idCol = "vec_id", src = "id_a", dst = "id_b")
      .join(assigned.select("vec_id", "list_id"), Seq("vec_id"))
      .select(col("vec_id"), col("list_id"), col("component"),
        (col("vec_id") === col("component")).as("keep"))
      .orderBy("vec_id")
  }
}
