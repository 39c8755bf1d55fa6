package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch plan probe: prints the executed plan of the canonicalization
  * projection so codegen participation is checkable without a test
  * cycle. Kept tiny; not referenced by any query row.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = docs.select(graft.operators.UrlOps.canonicalizeUrl(
      concat(lit("https://x.com/%41/"), col("doc_id").cast("string"))).as("c"))
    println(p.queryExecution.executedPlan.toString.take(2000))
    spark.stop()
  }
}
