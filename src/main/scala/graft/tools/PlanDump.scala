package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` of named SparkEntry queries to files —
  * the r15 optimization round's plan evidence (`plans/r15/<q>_{before,
  * after}.txt`). Composite rows (index builds, stream drains) execute
  * their eager phases while the frame is constructed; the dumped plan
  * is the plan of the RETURNED frame — the same thing the bench times
  * with `.count()`.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… SPARK_GRAFT_PLAN_OUT=plans/r15 \
  *   SPARK_GRAFT_PLAN_SUFFIX=after sbt "runMain graft.tools.PlanDump q_a q_b …"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT", "plans/r15")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "after")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = graft.SparkEntry.queries
    args.foreach { name =>
      qs.get(name) match {
        case None => System.err.println(s"[plandump] unknown query $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
            System.err.println(s"[plandump] wrote $name ($suffix)")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
