package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class UrlOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url"))).head().getString(0)
  }

  private def host(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("url")
      .select(UrlOps.canonicalHost(col("url"))).head().getString(0)
  }

  test("canonicalizeUrl: each rule, one case at a time") {
    // identity on an already-canonical URL
    assert(canon("https://example.com/p/1") == "https://example.com/p/1")
    // fragment stripped
    assert(canon("https://example.com/p/1#sec") == "https://example.com/p/1")
    // scheme + authority lowercased, path case preserved
    assert(canon("HTTPS://EXAMPLE.com/P/1") == "https://example.com/P/1")
    // scheme-default port stripped; non-default kept
    assert(canon("http://example.com:80/x") == "http://example.com/x")
    assert(canon("https://example.com:443/x") == "https://example.com/x")
    assert(canon("https://example.com:8443/x") == "https://example.com:8443/x")
    // :80 is NOT https-default and :443 is NOT http-default
    assert(canon("https://example.com:80/x") == "https://example.com:80/x")
    // leading www. stripped, inner www kept
    assert(canon("https://www.example.com/x") == "https://example.com/x")
    assert(canon("https://www.www.example.com/x") == "https://www.example.com/x")
    // trailing slashes stripped (root path collapses to bare authority)
    assert(canon("https://example.com/x///") == "https://example.com/x")
    assert(canon("https://example.com/") == "https://example.com")
    // tracking params dropped, survivors sorted, empty ? dropped
    assert(canon("https://example.com/x?utm_source=a&b=2&a=1") ==
      "https://example.com/x?a=1&b=2")
    assert(canon("https://example.com/x?utm_campaign=a&fbclid=z&gclid=1&ref=t") ==
      "https://example.com/x")
    // ref=... is tracking but refresh=1 is not (anchored (?:=|$))
    assert(canon("https://example.com/x?refresh=1") ==
      "https://example.com/x?refresh=1")
    // query values keep their case; bare ? with nothing after it drops
    assert(canon("https://example.com/x?B=UPPER") == "https://example.com/x?B=UPPER")
    assert(canon("https://example.com/x?") == "https://example.com/x")
  }

  test("canonicalHost: lowercase + port + www, query/fragment ignored") {
    assert(host("HTTPS://WWW.Example.COM:443/p/1?a=1#f") == "example.com")
    assert(host("http://cdn.media.example.com:80/x") == "cdn.media.example.com")
    assert(host("https://example.com") == "example.com")
  }

  test("domainChain: every >=2-label suffix, most-specific first") {
    import spark.implicits._
    val chain = Seq("a.b.example.com").toDF("h")
      .select(UrlOps.domainChain(col("h"))).head().getSeq[String](0)
    assert(chain == Seq("a.b.example.com", "b.example.com", "example.com"))
    // single label: the host itself (no empty sequence() blowup)
    val one = Seq("localhost").toDF("h")
      .select(UrlOps.domainChain(col("h"))).head().getSeq[String](0)
    assert(one == Seq("localhost"))
  }

  test("dedupByCanonicalUrl keeps the smallest key of each group, all columns") {
    import spark.implicits._
    val df = Seq(
      (3L, "https://www.Example.com/a/", "z3"),
      (1L, "https://example.com/a?utm_source=x", "z1"),
      (2L, "https://example.com/b", "z2"),
      (7L, "https://example.com/a", "z7")).toDF("doc_id", "url", "payload")
    val kept = UrlOps.dedupByCanonicalUrl(df, "url", "doc_id")
      .orderBy("doc_id").collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // the kept row is row 1 IN FULL (its url and payload, not a mix)
    val r1 = kept.find(_.getLong(0) == 1L).get
    assert(r1.getString(1) == "https://example.com/a?utm_source=x")
    assert(r1.getString(2) == "z1")
    assert(r1.getString(3) == "https://example.com/a") // canon_url appended
  }

  test("filterBlockedDomains: suffix semantics, not substring or reverse-suffix") {
    import spark.implicits._
    val df = Seq(
      (1L, "ads.example.com"),     // blocked: parent example.com listed
      (2L, "example.com"),         // blocked: exact
      (3L, "notexample.com"),      // NOT blocked: substring is not suffix
      (4L, "example.com.evil.io"), // NOT blocked: reverse embedding
      (5L, "sub.tracker.net"),     // blocked: parent tracker.net
      (6L, "clean.org")).toDF("doc_id", "host")
    val block = Seq("example.com", "tracker.net").toDF("domain")
    val kept = UrlOps.filterBlockedDomains(df, "host", "doc_id", block)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(3L, 4L, 6L))
  }

  test("filterDisallowed: exact-host prefix rules, canonical path, no suffix bleed") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://example.com/admin/users"),      // blocked: /admin prefix
      (2L, "https://example.com/administrator"),     // blocked: raw prefix rule
      (3L, "https://example.com/public"),            // allowed
      (4L, "https://sub.example.com/admin/x"),       // allowed: rules are EXACT host
      (5L, "https://WWW.Example.com:443/admin/"),    // blocked: canonical host+path
      (6L, "https://other.org/admin")).toDF("doc_id", "url")
    val robots = Seq(("example.com", "/admin")).toDF("host", "prefix")
    val kept = UrlOps.filterDisallowed(df, "url", "doc_id", robots)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(3L, 4L, 6L), s"kept: $kept")
    // an EMPTY Disallow means ALLOW ALL (robots.txt standard) — it must
    // not become a block-everything rule via startsWith("")
    val emptyRule = Seq(("other.org", "")).toDF("host", "prefix")
    val kept2 = UrlOps.filterDisallowed(df, "url", "doc_id", emptyRule)
      .count()
    assert(kept2 == 6, s"empty Disallow must block nothing: kept $kept2 of 6")
  }

  test("filterBlockedDomains: a non-default port does not smuggle a host past the blocklist") {
    import spark.implicits._
    val df = Seq(
      (1L, "example.com:8080"),      // blocked — port must not mask the domain
      (2L, "ads.example.com:8443"),  // blocked via parent
      (3L, "fine.org:8080")).toDF("doc_id", "host")
    val block = Seq("example.com").toDF("domain")
    val kept = UrlOps.filterBlockedDomains(df, "host", "doc_id", block)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(3L), s"kept: $kept")
  }
}
