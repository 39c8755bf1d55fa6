package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the URL/HTML extraction layer: the invariants the
  * rule-by-rule example specs can't exhaust. Generated URLs run through
  * the Spark expressions in bulk (one DataFrame per property run, not
  * one job per case — Spark job startup would otherwise dominate).
  */
class UrlOpsPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // generator for messy-but-plausible absolute URLs: mixed-case scheme
  // and host, optional www/port/path/trailing slashes/params/fragment
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "HtTpS")
    www <- Gen.oneOf("", "www.", "WWW.")
    host <- Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaLowerChar, Gen.alphaUpperChar))
      .map(_.mkString.take(10))
    tld <- Gen.oneOf("com", "org", "net")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(6)))
      .map(_.take(3))
    // percent-escapes: unreserved (decode), reserved (uppercase in
    // place), malformed (verbatim) — round-11 normalization rules
    pct <- Gen.oneOf("", "%7E", "%7e", "%41", "%2f", "%2F", "%9z", "%")
    slashes <- Gen.oneOf("", "/", "//")
    params <- Gen.listOf(Gen.oneOf("a=1", "b=2", "utm_source=x", "fbclid=9",
      "ref=t", "z=Z", "e=%7e", "r=%3f")).map(_.take(4))
    frag <- Gen.oneOf("", "#top", "#a/b?c")
  } yield {
    val path = segs.map("/" + _).mkString + pct + slashes
    val q = if (params.isEmpty) "" else "?" + params.mkString("&")
    s"$scheme://$www$host.$tld$port$path$q$frag"
  }

  private def canonBulk(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(UrlOps.canonicalizeUrl(col("url")))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalizeUrl is IDEMPOTENT on generated URLs (canon(canon(u)) == canon(u))") {
    val urls = Gen.listOfN(300, urlGen).sample.get
    val once = canonBulk(urls)
    val twice = canonBulk(once)
    val broken = once.zip(twice).zipWithIndex.filter { case ((a, b), _) => a != b }
    assert(broken.isEmpty,
      s"non-idempotent canonicalization: ${broken.take(3).map { case ((a, b), i) => s"${urls(i)} -> $a -> $b" }}")
  }

  test("canonical form never carries a fragment, default port, leading www, tracking param, or unsorted params") {
    val urls = Gen.listOfN(300, urlGen).sample.get
    canonBulk(urls).foreach { c =>
      assert(!c.contains("#"), c)
      assert(!c.matches("(?i)https://[^/?]*:443(/.*)?(\\?.*)?"), c)
      assert(!c.matches("(?i)http://[^/?]*:80(/.*)?(\\?.*)?"), c)
      assert(!c.matches("(?i)[a-z+.-]+://www\\..*"), c)
      assert(!c.contains("utm_") && !c.contains("fbclid"), c)
      val qs = c.split("\\?", 2)
      if (qs.length == 2) {
        val params = qs(1).split("&").toSeq
        assert(params == params.sorted, s"unsorted params in $c")
        assert(params.forall(_.nonEmpty), s"empty param survived in $c")
      }
      assert(!c.endsWith("/"), s"trailing slash survived in $c")
    }
  }

  test("domainChain: every element is a dot-suffix of the full host; last is the 2-label root") {
    import spark.implicits._
    val hosts = Gen.listOfN(200,
      Gen.chooseNum(1, 5).flatMap(n =>
        Gen.listOfN(n, Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(6)))
          .map(_.mkString(".")))).sample.get
    val chains = hosts.toDF("h")
      .select(col("h"), UrlOps.domainChain(col("h")).as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1))
    chains.foreach { case (h, chain) =>
      val labels = h.split("\\.")
      if (labels.length == 1) assert(chain == Seq(h))
      else {
        assert(chain.length == labels.length - 1, s"$h -> $chain")
        assert(chain.head == h)
        chain.foreach(s => assert(h == s || h.endsWith("." + s), s"$s not a suffix of $h"))
        assert(chain.last == labels.takeRight(2).mkString("."))
      }
    }
  }

  test("percent-encoding an unreserved path character never changes the canonical form") {
    import spark.implicits._
    // pairs (literal, escaped-twin): one alphanumeric path char swapped
    // for its %XX escape (upper- and lower-case hex both)
    val pairGen = for {
      host <- Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))
      seg <- Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(6))
      c <- Gen.alphaNumChar
      hexCase <- Gen.oneOf(true, false)
    } yield {
      val hex = f"${c.toInt}%02X"
      val esc = "%" + (if (hexCase) hex else hex.toLowerCase)
      (s"https://$host.com/$seg$c", s"https://$host.com/$seg$esc")
    }
    val pairs = Gen.listOfN(200, pairGen).sample.get
    val out = pairs.toDF("lit", "esc")
      .select(UrlOps.canonicalizeUrl(col("lit")).as("a"),
        UrlOps.canonicalizeUrl(col("esc")).as("b"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val broken = pairs.zip(out).filter { case (_, (a, b)) => a != b }
    assert(broken.isEmpty, s"escape changed canonical: ${broken.take(3)}")
  }

  test("mainContent is minification-invariant on generated block-structured pages") {
    import spark.implicits._
    val lineGen = for {
      tag <- Gen.oneOf("p", "div", "li", "h2")
      words <- Gen.listOfN(12, Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(7)))
      anchored <- Gen.oneOf(true, false)
    } yield {
      val body = if (anchored)
        s"""<a href="/x">${words.take(4).mkString(" ")}</a> ${words.drop(4).mkString(" ")}"""
      else words.mkString(" ")
      s"<$tag>$body</$tag>"
    }
    val pageGen = Gen.listOfN(4, lineGen).map(_.mkString("\n"))
    val pages = Gen.listOfN(150, pageGen).sample.get
    val out = pages.toDF("page")
      .select(
        TextExtraction.mainContent(col("page")).as("formatted"),
        TextExtraction.mainContent(
          org.apache.spark.sql.functions.regexp_replace(
            col("page"), "\n", "")).as("minified"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val broken = pages.zip(out).filter { case (_, (a, b)) => a != b }
    assert(broken.isEmpty,
      s"minification changed extraction: ${broken.take(2)}")
  }

  test("stripHtml output never contains a tag or an undecoded predefined entity") {
    import spark.implicits._
    val htmlGen = for {
      words <- Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8)))
      tag <- Gen.oneOf("b", "i", "div", "span", "a href=\"/x\"")
      ent <- Gen.oneOf("&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;")
    } yield s"<p>${words.take(10).mkString(" ")} <$tag>x</${tag.split(" ")(0)}> $ent</p>"
    val pages = Gen.listOfN(200, htmlGen).sample.get
    val out = pages.toDF("h")
      .select(TextExtraction.stripHtml(col("h")))
      .collect().map(_.getString(0))
    out.foreach { t =>
      assert(!t.matches(".*<[^>]*>.*"), s"tag survived: $t")
      Seq("&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;").foreach(e =>
        assert(!t.contains(e), s"entity $e survived: $t"))
      assert(!t.contains("  "), s"whitespace run survived: $t")
    }
  }
}
