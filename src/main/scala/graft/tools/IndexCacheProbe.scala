package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does persisting a bucketed-table scan (a) keep the bucket hash
  * partitioning visible to the planner (join stays exchange-free on
  * the cached side), and (b) make the fixed-point loops faster than
  * re-scanning the parquet per iteration? Diagnostic for the
  * persistEdges=false choice in pagerankAgainstIndex/hitsAgainstIndex.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.IndexCacheProbe"
  */
object IndexCacheProbe {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.LinkGraph

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pages = docs.select(col("doc_id"),
      concat(lit("https://site"), (col("doc_id") % 13).cast("string"),
        lit(".example.com/d/"), col("doc_id").cast("string")).as("url"),
      concat(lit("<p><a href=\"/p/"), ((col("doc_id") + 3) % 11).cast("string"),
        lit("\">x</a> <a href=\"https://hub"), (col("doc_id") % 13).cast("string"),
        lit(".example.net/h/"), (col("doc_id") % 5).cast("string"),
        lit("\">h</a></p>")).as("html"))
    val edges = LinkGraph.extractLinks(pages, "url", "html")
    LinkGraph.writeEdgeIndex(edges, "icp_edge_index")

    // (a) plan shape: join on src against a rank-like frame, edge side
    // bucketed scan — count Exchanges with and without a persist
    val idx = spark.table("icp_edge_index").dropDuplicates("src", "dst")
    val ranks = edges.select(col("src").as("url")).distinct()
      .withColumn("rank", lit(1L))
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString.sliding("Exchange".length)
        .count(_ == "Exchange")
    val plain = idx.join(ranks, idx("src") === ranks("url"))
    println(s"[icp] exchanges, plain bucketed scan join: ${exchanges(plain)}")
    val cached = idx.persist()
    cached.count()
    val cj = cached.join(ranks, cached("src") === ranks("url"))
    println(s"[icp] exchanges, CACHED bucketed scan join: ${exchanges(cj)}")
    println(cj.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("InMemory") || l.contains("Scan"))
      .take(8).mkString("\n"))
    cached.unpersist()

    // (b) wall: 3 passes each, min
    def mn(f: => Unit): Double = (1 to 3).map(_ => time(f)).min
    // warm
    LinkGraph.pagerankAgainstIndex(spark, "icp_edge_index").count()
    val tNoCache = mn(LinkGraph.pagerankAgainstIndex(spark, "icp_edge_index").count())
    val tCache = mn(LinkGraph.pagerank(
      spark.table("icp_edge_index").dropDuplicates("src", "dst")).count())
    println(f"[icp] pagerank idx (persistEdges=false) min=$tNoCache%.2f s; " +
      f"with persist (pagerank over index frame) min=$tCache%.2f s")
    spark.stop()
  }
}
