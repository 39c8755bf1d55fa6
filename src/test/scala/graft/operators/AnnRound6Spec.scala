package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 ANN additions: the IVF-SQ8 composed index, the SQ8 external-
  * vector serving overload, the maintainIvfIndex drift policy, the
  * append dimension guard, the zero-norm contract, and the single-pass
  * probe-assignment wiring.
  */
class AnnRound6Spec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def dropIdx(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"DROP TABLE IF EXISTS ${name}_centroids")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def causes(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  // ----------------------------------------------------- SQ8 serving path

  test("topKSq8 external-vector overload equals the by-id path for an indexed vector") {
    import spark.implicits._
    val qVec = emb.filter(col("vec_id") === 3L)
      .select("embedding").as[Array[Float]].head()
    val byId = rows(Ann.topKSq8(emb, queryId = 3L, k = 10))
    val byVec = rows(Ann.topKSq8(emb, qVec, k = 10))
    // symmetric: the external copy is quantized with the same [mn, mx],
    // so it decodes identically and the self-cosine stays exactly 1
    assert(byVec == byId && byVec.head == ((3L, 1.0)))
    intercept[IllegalArgumentException] {
      Ann.topKSq8(emb, Array.fill(qVec.length)(0f), k = 5)
    }
  }

  // --------------------------------------------------- IVF-SQ8 composed

  test("IVF-SQ8 index: full probe ≡ brute-force SQ8, external overload, pruning") {
    import spark.implicits._
    Ann.writeIvfSq8Index(emb, "sq8_idx", nlist = 8)
    try {
      // decode-in-kernel at nProbe = nlist is bit-identical to the
      // decoded brute force (same FP op order)
      val full = rows(Ann.ivfTopKSq8AgainstIndex(spark, "sq8_idx", queryId = 3L, k = 10, nProbe = 8))
      val brute = rows(Ann.topKSq8(emb, queryId = 3L, k = 10))
      assert(full == brute && full.head == ((3L, 1.0)))
      // external-vector serving parity for an indexed vector
      val qVec = emb.filter(col("vec_id") === 3L)
        .select("embedding").as[Array[Float]].head()
      val byVec = rows(Ann.ivfTopKSq8AgainstIndex(spark, "sq8_idx", qVec, k = 10, nProbe = 8))
      assert(byVec == full)
      // absent query id → empty (matching the float index tier)
      assert(Ann.ivfTopKSq8AgainstIndex(spark, "sq8_idx", queryId = -5L, k = 10, nProbe = 4).count() == 0)
      // the probe restriction must prune list partitions at the scan
      val plan = Ann.ivfTopKSq8AgainstIndex(spark, "sq8_idx", queryId = 3L, k = 10, nProbe = 2)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("PartitionFilters:") && plan.contains("ivf_list"), plan)
      // the stored payload is codes, not floats: no embedding column
      assert(!spark.table("sq8_idx").columns.contains("embedding"))
    } finally dropIdx("sq8_idx")
  }

  test("IVF-SQ8 index refuses a float-index table (and vice versa fails on graft.sq8)") {
    Ann.writeIvfIndex(emb, "sq8_float_idx", nlist = 4)
    try {
      val e = intercept[IllegalArgumentException] {
        Ann.ivfTopKSq8AgainstIndex(spark, "sq8_float_idx", queryId = 0L, k = 5, nProbe = 1)
      }
      assert(e.getMessage.contains("graft.sq8"))
    } finally dropIdx("sq8_float_idx")
  }

  // ------------------------------------------------- maintainIvfIndex

  test("maintainIvfIndex: append-only under threshold, rebuild on drift, drift resets") {
    import spark.implicits._
    val base = emb.filter(col("vec_id") % 2 === 0)
    Ann.writeIvfIndex(base, "mnt_idx", nlist = 8)
    try {
      // in-distribution batch: no rebuild, centroids untouched
      val centroidsBefore = spark.table("mnt_idx_centroids")
        .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
      val (r1, rebuilt1) = Ann.maintainIvfIndex(
        emb.filter(col("vec_id") % 2 === 1), "mnt_idx", driftThreshold = 1.2)
      assert(!rebuilt1 && r1 < 1.2)
      assert(spark.table("mnt_idx_centroids")
        .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq == centroidsBefore)
      // far-out-of-distribution batch: drift crosses the threshold,
      // the policy rebuilds, and the fresh reference restores ratio = 1
      val dim = emb.select("embedding").as[Array[Float]].head().length
      val shifted = (0 until 64).map { i =>
        (100000L + i, Array.tabulate(dim)(j => 50f + (i + j) % 7))
      }.toDF("vec_id", "embedding")
      val (r2, rebuilt2) = Ann.maintainIvfIndex(shifted, "mnt_idx", driftThreshold = 1.2)
      assert(rebuilt2 && r2 > 1.2, s"expected rebuild, got ratio $r2")
      val (_, _, after) = Ann.ivfDrift(spark, "mnt_idx")
      assert(math.abs(after - 1.0) < 1e-9, s"post-rebuild drift $after")
      // the rebuilt index answers like one built from scratch on the
      // same corpus (same deterministic sample → same centroids), at a
      // PRUNED probe where centroid placement matters
      val scratchInput = spark.table("mnt_idx")
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      Ann.writeIvfIndex(scratchInput, "mnt_scratch_idx", nlist = 8)
      val viaMaintained = rows(Ann.ivfTopKAgainstIndex(spark, "mnt_idx", queryId = 3L, k = 10, nProbe = 2))
      val viaScratch = rows(Ann.ivfTopKAgainstIndex(spark, "mnt_scratch_idx", queryId = 3L, k = 10, nProbe = 2))
      assert(viaMaintained == viaScratch)
    } finally { dropIdx("mnt_idx"); dropIdx("mnt_scratch_idx") }
  }

  // -------------------------------------------------- append dim guard

  test("appendToIvfIndex fails loudly on a wrong-dimension batch") {
    import spark.implicits._
    Ann.writeIvfIndex(emb, "dim_idx", nlist = 4)
    try {
      val dim = emb.select("embedding").as[Array[Float]].head().length
      val bad = Seq((777777L, Array.fill(dim + 3)(0.5f))).toDF("vec_id", "embedding")
      val e = intercept[Exception] { Ann.appendToIvfIndex(bad, "dim_idx") }
      assert(causes(e).exists(_.contains("dimension")),
        s"expected a dimension error, got: ${causes(e).mkString(" | ")}")
      // nothing was appended
      assert(spark.table("dim_idx").filter(col("vec_id") === 777777L).count() == 0)
    } finally dropIdx("dim_idx")
  }

  test("probe paths fail loudly on a wrong-dimension batch or query (same contract as append)") {
    import spark.implicits._
    Ann.writeIvfIndex(emb, "dimp_idx", nlist = 4)
    try {
      val dim = emb.select("embedding").as[Array[Float]].head().length
      val bad = Seq((777777L, Array.fill(dim - 5)(0.5f))).toDF("vec_id", "embedding")
      // a SHORTER batch previously probed prefix lists and emitted prefix
      // cosines silently — the failure mode the guard closes
      val e1 = intercept[Exception] {
        Ann.neardupAgainstIvfIndex(bad, "dimp_idx", 0.5, nProbe = 4).count()
      }
      assert(causes(e1).exists(_.contains("dimension")),
        s"expected a dimension error, got: ${causes(e1).mkString(" | ")}")
      val e2 = intercept[Exception] {
        Ann.ivfTopKAgainstIndex(spark, "dimp_idx",
          Array.fill(dim - 5)(0.5f), k = 3, nProbe = 2).count()
      }
      assert(causes(e2).exists(_.contains("dimension")),
        s"expected a dimension error, got: ${causes(e2).mkString(" | ")}")
    } finally dropIdx("dimp_idx")
  }

  test("ivfDrift: a zero write-time reference with nonzero live mean reads as infinite drift") {
    import spark.implicits._
    // a corpus of ≤ nlist distinct patterns trains centroids that COINCIDE
    // with the vectors → write-time meanDist = 0; the old ratio rule
    // returned 1.0 here forever and the maintain policy could never fire
    val seed = (0L until 4L).map(i =>
      (i, Array.tabulate(8)(j => if (j == i) 1.0f else 0.0f))).toDF("vec_id", "embedding")
    Ann.writeIvfIndex(seed, "zref_idx", nlist = 4)
    try {
      val (ref0, _, r0) = Ann.ivfDrift(spark, "zref_idx")
      assert(ref0 == 0.0 && r0 == 1.0)
      val off = Seq((100L, Array.fill(8)(0.7f))).toDF("vec_id", "embedding")
      Ann.appendToIvfIndex(off, "zref_idx")
      val (_, cur, ratio) = Ann.ivfDrift(spark, "zref_idx")
      assert(cur > 0 && ratio.isPosInfinity,
        s"zero-reference drift must be infinite, got $ratio")
      // and the maintenance policy actually rebuilds on it
      val (_, rebuilt) = Ann.maintainIvfIndex(
        Seq((101L, Array.fill(8)(0.6f))).toDF("vec_id", "embedding"), "zref_idx")
      assert(rebuilt, "maintain must rebuild on infinite drift")
    } finally dropIdx("zref_idx")
  }

  test("rebuild trains at the REQUESTED nlist once the corpus can support it") {
    import spark.implicits._
    // seed corpus of 3 vectors shrinks a 8-list request to effNlist = 3;
    // after the corpus grows, a drift rebuild must recover the full 8
    // lists instead of pinning the seed-time shrinkage forever
    val seed = (0L until 3L).map(i =>
      (i, Array.tabulate(8)(j => if (j == i) 1.0f else 0.0f))).toDF("vec_id", "embedding")
    Ann.writeIvfIndex(seed, "req_idx", nlist = 8)
    try {
      val props0 = spark.sql("SHOW TBLPROPERTIES req_idx").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props0("graft.nlist") == "3" && props0("graft.nlistRequested") == "8")
      val grown = (10L until 60L).map { i =>
        val r = new java.util.Random(i)
        (i, Array.fill(8)(r.nextFloat() * 2f - 1f))
      }.toDF("vec_id", "embedding")
      val (_, rebuilt) = Ann.maintainIvfIndex(grown, "req_idx", driftThreshold = 0.0001)
      assert(rebuilt)
      val props1 = spark.sql("SHOW TBLPROPERTIES req_idx").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props1("graft.nlist") == "8",
        s"rebuild over 53 vectors must train the requested 8 lists: ${props1("graft.nlist")}")
      assert(props1("graft.nlistRequested") == "8")
    } finally dropIdx("req_idx")
  }

  // ---------------------------------------------------- zero-norm rows

  test("withNorm drops zero-norm corpus vectors; a zero queryId resolves as absent") {
    import spark.implicits._
    val dim = emb.select("embedding").as[Array[Float]].head().length
    val withZero = emb.select(col("vec_id"), col("embedding"))
      .unionByName(Seq((999999L, Array.fill(dim)(0f))).toDF("vec_id", "embedding"))
    val n = emb.count().toInt
    // the zero vector never ranks (it would sort FIRST as NaN unfiltered)
    val all = rows(Ann.topK(withZero, queryId = 3L, k = n + 1))
    assert(all.nonEmpty && !all.exists(_._1 == 999999L))
    assert(all.forall(r => !r._2.isNaN))
    // zero-norm query id → absent → empty, like any missing id
    assert(Ann.topK(withZero, queryId = 999999L, k = 5).count() == 0)
    // index write excludes it too
    Ann.writeIvfIndex(withZero, "zn_idx", nlist = 4)
    try assert(spark.table("zn_idx").filter(col("vec_id") === 999999L).count() == 0)
    finally dropIdx("zn_idx")
  }

  // --------------------------------------- single-pass probe assignment

  test("neardupAgainstIvfIndex runs the probe-assignment pass once (cached packed batch)") {
    val newB = emb.filter(col("vec_id") % 2 === 1)
    val idx = emb.filter(col("vec_id") % 2 === 0)
    Ann.writeIvfIndex(idx, "sp_idx", nlist = 8)
    val generateRuns = new java.util.concurrent.atomic.AtomicInteger
    val cacheReads = new java.util.concurrent.atomic.AtomicInteger
    val actions = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        actions.incrementAndGet()
        // a Generate (the explode over the assignment UDF) surviving into
        // the optimized plan means that action re-plans the assignment;
        // with the packed batch cached, EVERY action reads the
        // InMemoryRelation instead and the UDF runs once, inside the
        // cache materialization of the first action
        if (qe.optimizedPlan.collectFirst {
          case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
        }.isDefined) generateRuns.incrementAndGet()
        if (qe.optimizedPlan.collectFirst {
          case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
        }.isDefined) cacheReads.incrementAndGet()
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = Ann.neardupAgainstIvfIndex(newB, "sp_idx", 0.45, nProbe = 8)
      assert(out.count() > 0)
      // listener bus is async — drain before asserting
      val deadline = System.nanoTime() + 10_000_000_000L
      while (actions.get() < 2 && System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(500)
      assert(generateRuns.get() == 0,
        s"assignment explode re-planned in ${generateRuns.get()} action(s)")
      assert(cacheReads.get() >= 2,
        s"expected both the probed-list collect and the kernel action to read the cache, saw ${cacheReads.get()}")
    } finally {
      spark.listenerManager.unregister(listener)
      spark.catalog.clearCache()
      dropIdx("sp_idx")
    }
  }
  // ------------------------------------------------ SQ8 near-dup serving

  test("neardupAgainstIvfSq8Index: planted duplicates score cosine 1 (symmetric distance)") {
    import spark.implicits._
    dropIdx("sq8_nd_idx")
    try {
      val idx = emb.filter(col("vec_id") % 2 === 0)
      Ann.writeIvfSq8Index(idx, "sq8_nd_idx", nlist = 8)
      // the batch = exact copies of four indexed vectors under odd ids:
      // symmetric quantize+decode must give them self-cosine exactly 1
      val planted = idx.filter(col("vec_id") % 50 === 0).limit(4)
        .select((col("vec_id") + 1000001L).as("vec_id"), col("embedding"))
      val got = Ann.neardupAgainstIvfSq8Index(planted, "sq8_nd_idx",
          threshold = 0.999, nProbe = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val plantedIds = planted.select("vec_id").as[Long].collect().toSet
      assert(plantedIds.nonEmpty)
      plantedIds.foreach { pid =>
        assert(got.exists(t => t._1 == pid && t._2 == pid - 1000001L && t._3 == 1.0),
          s"planted copy $pid did not pair with its source at cos 1.0: ${got.toSeq}")
      }
    } finally dropIdx("sq8_nd_idx")
  }

  test("neardupAgainstIvfSq8Index: nProbe < nlist returns a subset of the full probe") {
    dropIdx("sq8_nd_sub")
    try {
      Ann.writeIvfSq8Index(emb.filter(col("vec_id") % 2 === 0), "sq8_nd_sub", nlist = 8)
      val batch = emb.filter(col("vec_id") % 2 === 1)
      def pairs(nProbe: Int): Set[(Long, Long)] =
        Ann.neardupAgainstIvfSq8Index(batch, "sq8_nd_sub", threshold = 0.4, nProbe = nProbe)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val full = pairs(8)
      val sub = pairs(1)
      assert(full.nonEmpty, "full probe should find pairs at 0.4 on this corpus")
      assert(sub.subsetOf(full))
    } finally { spark.catalog.clearCache(); dropIdx("sq8_nd_sub") }
  }
  // --------------------------------------------- SQ8 index maintenance

  test("maintainIvfSq8Index: append-only under threshold, rebuild on drift, codes survive") {
    import spark.implicits._
    dropIdx("sq8_mnt_idx")
    Ann.writeIvfSq8Index(emb.filter(col("vec_id") % 2 === 0), "sq8_mnt_idx", nlist = 8)
    try {
      // in-distribution batch: append only, centroids untouched
      val centroidsBefore = spark.table("sq8_mnt_idx_centroids")
        .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
      val (r1, rebuilt1) = Ann.maintainIvfSq8Index(
        emb.filter(col("vec_id") % 2 === 1), "sq8_mnt_idx", driftThreshold = 1.2)
      assert(!rebuilt1 && r1 < 1.2, s"unexpected rebuild at ratio $r1")
      assert(spark.table("sq8_mnt_idx_centroids")
        .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq == centroidsBefore)
      val codesBefore = spark.table("sq8_mnt_idx")
        .select("vec_id", "code").as[(Long, Array[Byte])]
        .collect().map { case (id, c) => id -> c.toSeq }.toMap
      // far-out-of-distribution batch: rebuild fires, drift resets, and
      // requantization is idempotent — every vector's code is unchanged
      val dim = emb.select("embedding").as[Array[Float]].head().length
      val shifted = (0 until 64).map { i =>
        (200000L + i, Array.tabulate(dim)(j => 50f + (i + j) % 7))
      }.toDF("vec_id", "embedding")
      val (r2, rebuilt2) = Ann.maintainIvfSq8Index(shifted, "sq8_mnt_idx", driftThreshold = 1.2)
      assert(rebuilt2 && r2 > 1.2, s"expected rebuild, got ratio $r2")
      val (_, _, after) = Ann.ivfDrift(spark, "sq8_mnt_idx")
      assert(math.abs(after - 1.0) < 1e-9, s"post-rebuild drift $after")
      val codesAfter = spark.table("sq8_mnt_idx")
        .select("vec_id", "code").as[(Long, Array[Byte])]
        .collect().map { case (id, c) => id -> c.toSeq }.toMap
      codesBefore.foreach { case (id, c) =>
        assert(codesAfter(id) == c, s"vec $id requantized to different codes")
      }
    } finally dropIdx("sq8_mnt_idx")
  }

  test("appendToIvfSq8Index refuses a float-index table and a wrong-dimension batch") {
    import spark.implicits._
    dropIdx("sq8_app_guard"); dropIdx("float_app_guard")
    try {
      Ann.writeIvfIndex(emb, "float_app_guard", nlist = 4)
      val e1 = intercept[Exception] {
        Ann.appendToIvfSq8Index(emb, "float_app_guard")
      }
      assert(causes(e1).exists(_.contains("graft.sq8")))
      Ann.writeIvfSq8Index(emb, "sq8_app_guard", nlist = 4)
      val bad = Seq((999999L, Array.fill(3)(1.0f))).toDF("vec_id", "embedding")
      val e2 = intercept[Exception] { Ann.appendToIvfSq8Index(bad, "sq8_app_guard") }
      assert(causes(e2).exists(_.contains("dimension")))
    } finally { dropIdx("sq8_app_guard"); dropIdx("float_app_guard") }
  }
  test("SQ8 rebuild preserves codes even for small-span high-magnitude vectors") {
    import spark.implicits._
    dropIdx("sq8_ulp_idx")
    try {
      // elements ~1000 with span 0.01: the quantization step (~3.9e-5)
      // is BELOW ulp(1000f) (~6.1e-5), so any dequantize -> float ->
      // requantize round-trip collapses adjacent codes — the rebuild
      // must rewrite stored codes verbatim instead
      val rng = new scala.util.Random(1)
      val vecs = (0 until 128).map { i =>
        (i.toLong, Array.tabulate(16)(j => 1000.0f + (rng.nextInt(256) / 255.0f) * 0.01f))
      }.toDF("vec_id", "embedding")
      Ann.writeIvfSq8Index(vecs, "sq8_ulp_idx", nlist = 4)
      val codesBefore = spark.table("sq8_ulp_idx")
        .select("vec_id", "code").as[(Long, Array[Byte])]
        .collect().map { case (id, c) => id -> c.toSeq }.toMap
      // far-shifted batch forces the drift rebuild
      val shifted = (0 until 32).map { i =>
        (100000L + i, Array.tabulate(16)(j => -500f + i + j))
      }.toDF("vec_id", "embedding")
      val (_, rebuilt) = Ann.maintainIvfSq8Index(shifted, "sq8_ulp_idx", driftThreshold = 1.2)
      assert(rebuilt, "fixture should force a rebuild")
      val codesAfter = spark.table("sq8_ulp_idx")
        .select("vec_id", "code").as[(Long, Array[Byte])]
        .collect().map { case (id, c) => id -> c.toSeq }.toMap
      codesBefore.foreach { case (id, c) =>
        assert(codesAfter(id) == c, s"vec $id codes corrupted by rebuild")
      }
    } finally dropIdx("sq8_ulp_idx")
  }
}
