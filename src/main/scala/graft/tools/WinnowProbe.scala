package graft.tools

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of sharedSpanPairs to pin the r5 bench
  * regression. Scratch probe, not part of the library surface.
  */
object WinnowProbe {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    System.err.println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm file listing
    (1 to 2).foreach { rep =>
      System.err.println(s"--- rep $rep")
      time("udf+explode count")(
        TextAnalysis.winnowFingerprints(docs).count())
      val fps = TextAnalysis.winnowFingerprints(docs).select("doc_id", "fp")
      time("distinct count")(fps.distinct().count())
      val buckets = fps.distinct().groupBy("fp")
        .agg(collect_list("doc_id").as("ds"))
        .filter(size(col("ds")) > 1 && size(col("ds")) <= 20)
      time("buckets count")(buckets.count())
      time("full sharedSpanPairs")(
        TextAnalysis.sharedSpanPairs(docs, minShared = 10, maxDocsPerFp = Some(20)).count())
    }
    spark.stop()
  }
}
