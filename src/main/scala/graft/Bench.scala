package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (stdout). Per-query progress goes to stderr.
  *
  * Noise hygiene (one query must not poison the next):
  *  - `spark.catalog.clearCache()` + a GC barrier before every timed run,
  *    so spill files, cached blocks and heap pressure from a previous query
  *    can't inflate its successors;
  *  - each query runs twice and reports the min — the first run absorbs
  *    JIT/codegen compilation and shuffle-file warm-up, the min is the
  *    reproducible number.
  */
object Bench {

  private def gcBarrier(): Unit = {
    System.gc()
    System.runFinalization()
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up: JIT + codegen + shuffle service on the tiny SF, untimed
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var best = Double.MaxValue
      var lastElapsed = 0.0
      var rows = -1L
      var rep = 0
      while (rep < reps) {
        spark.catalog.clearCache()
        gcBarrier()
        val t0 = System.nanoTime()
        val ok =
          try { rows = fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
        lastElapsed = (System.nanoTime() - t0) / 1e9
        // a failed rep's fast-fail time must not win the min — only
        // successful reps compete; rows = -1 flags an all-failed query
        if (ok && lastElapsed < best) best = lastElapsed
        rep += 1
      }
      if (best == Double.MaxValue) best = lastElapsed
      System.err.println(f"[bench] $name%-24s $best%8.2f s  ($rows rows)")
      name -> best
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
