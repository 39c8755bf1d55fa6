package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-family phase probe: separates, for the hot link rows, (a)
  * driver-side plan derivation (analysis+optimization+physical
  * planning, forced via `executedPlan`) from (b) execution (noop
  * sink), and times each sub-operator of the composites in isolation —
  * extraction vs the iterate — so the family's 4–9 s bench rows are
  * attributable before anything is changed. Three timed passes after a
  * warm-up pass; min is reported (the bench's own convention).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.LinkPhaseProbe"
  */
object LinkPhaseProbe {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def report(spark: SparkSession, name: String)(mk: => DataFrame): Unit = {
    // one warm pass, then min of 3
    noop(mk)
    val plans = (1 to 3).map(_ => time(mk.queryExecution.executedPlan))
    val execs = (1 to 3).map { _ =>
      val df = mk
      df.queryExecution.executedPlan // pre-derive so exec time is execution
      time(noop(df))
    }
    println(f"[lpp] $name%-28s plan=${plans.min}%6.3f s  exec=${execs.min}%6.3f s")
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
    import graft.operators.{LinkGraph, UrlOps}

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the bench's own page plants, reproduced from SparkEntry's helpers
    val pagesLinked = docs.select(col("doc_id"),
        concat(lit("https://site"), (col("doc_id") % 13).cast("string"),
          lit(".example.com/d/"), col("doc_id").cast("string")).as("url"),
        col("text")).select(col("doc_id"), col("url"), concat(
        lit("<p>intro <a href=\"HTTPS://HUB"),
        (col("doc_id") % 13).cast("string"),
        lit(".Example.net/h/"), (col("doc_id") % 5).cast("string"),
        lit("\">hub</a> <a href=\"/p/"),
        ((col("doc_id") + 3) % 11).cast("string"),
        lit("\">next</a> <a href=/q/"),
        ((col("doc_id") + 5) % 7).cast("string"),
        lit(">unq</a> <a href='mailto:x@y'>mail</a>" +
          " <a href=\"#top\">top</a></p>")).as("html"))

    println(s"[lpp] pages = ${pagesLinked.count()} rows")

    report(spark, "extractLinks")(
      LinkGraph.extractLinks(pagesLinked, "url", "html"))
    report(spark, "extractLinksWithRel")(
      LinkGraph.extractLinksWithRel(pagesLinked, "url", "html"))
    report(spark, "extractAnchors")(
      LinkGraph.extractAnchors(pagesLinked, "url", "html"))
    report(spark, "canonicalizeUrl x1")(
      docs.select(UrlOps.canonicalizeUrl(concat(
        lit("HTTPS://WWW.Example.COM:443/a/%41/../b/?utm_source=x&b=2&a=1#f"),
        col("doc_id").cast("string"))).as("c")))

    // pre-materialized edges so the iterate is timed alone
    val edges = LinkGraph.extractLinks(pagesLinked, "url", "html")
      .localCheckpoint(true)
    println(s"[lpp] edges = ${edges.count()} rows")
    (1 to 3).foreach { i =>
      val t = time(noop(LinkGraph.pagerank(edges, iters = 3)))
      println(f"[lpp] pagerank(3) pass$i = $t%6.3f s")
    }
    (1 to 3).foreach { i =>
      val t = time(noop(LinkGraph.hits(edges, iters = 2)))
      println(f"[lpp] hits(2) pass$i = $t%6.3f s")
    }
    (1 to 3).foreach { i =>
      val t = time(noop(LinkGraph.components(edges)))
      println(f"[lpp] components pass$i = $t%6.3f s")
    }
    spark.stop()
  }
}
