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

  private def disallowKept(urls: Seq[(Long, String)],
                           rules: Seq[(String, String, Boolean)]): Seq[Long] = {
    import spark.implicits._
    UrlOps.filterDisallowed(urls.toDF("doc_id", "url"), "url", "doc_id",
        rules.toDF("host", "pattern", "allow"))
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
  }

  test("filterDisallowed: exact-host prefix rules, no suffix bleed") {
    val df = Seq(
      (1L, "https://example.com/admin/users"),      // blocked: /admin prefix
      (2L, "https://example.com/administrator"),     // blocked: raw prefix rule
      (3L, "https://example.com/public"),            // allowed
      (4L, "https://sub.example.com/admin/x"),       // allowed: rules are EXACT host
      (5L, "https://WWW.Example.com:443/admin/"),    // blocked: canonical host+path
      (6L, "https://other.org/admin"))
    val kept = disallowKept(df, Seq(("example.com", "/admin", false)))
    assert(kept == Seq(3L, 4L, 6L), s"kept: $kept")
    // an EMPTY Disallow means ALLOW ALL (robots.txt standard) — it must
    // not become a block-everything rule via prefix-of-everything
    val kept2 = disallowKept(df, Seq(("other.org", "", false)))
    assert(kept2.size == 6, s"empty Disallow must block nothing: kept $kept2")
  }

  test("filterDisallowed: 'Disallow: /' blocks the host ROOT and everything else") {
    // the round-10 advice finding: the root page canonicalizes to an
    // empty path, which a trailing-slash-stripped prefix check let leak
    val df = Seq(
      (1L, "https://x.com/"),          // the bare root — must be blocked
      (2L, "https://x.com"),           // no-path form of the root
      (3L, "https://x.com/p/1"),       // any page
      (4L, "https://other.org/"))      // other hosts untouched
    val kept = disallowKept(df, Seq(("x.com", "/", false)))
    assert(kept == Seq(4L), s"kept: $kept")
  }

  test("filterDisallowed: longest-match wins, Allow beats Disallow on ties") {
    val df = Seq(
      (1L, "https://x.com/p/1"),    // blocked by /p/
      (2L, "https://x.com/p/10"),   // allowed: /p/10 (longer) overrides /p/
      (3L, "https://x.com/q"))      // no rule matches -> allowed
    val kept = disallowKept(df, Seq(
      ("x.com", "/p/", false), ("x.com", "/p/10", true)))
    assert(kept == Seq(2L, 3L), s"kept: $kept")
    // exact tie (same length): Allow wins — REP least-restrictive rule
    val tie = disallowKept(Seq((1L, "https://x.com/p/1")),
      Seq(("x.com", "/p/1", false), ("x.com", "/p/1", true)))
    assert(tie == Seq(1L), s"tie must resolve to Allow: $tie")
  }

  test("filterDisallowed: '*' wildcards and trailing-$ anchors") {
    val df = Seq(
      (1L, "https://x.com/a/deep/file.pdf"), // blocked: /*.pdf$
      (2L, "https://x.com/file.pdf/view"),   // allowed: $ anchors the end
      (3L, "https://x.com/tmp5/x"),          // blocked: /tmp*/
      (4L, "https://x.com/tmp"),             // allowed: no trailing /
      (5L, "https://x.com/a.pdf?dl=1"))      // allowed: query after .pdf, $ fails
    val kept = disallowKept(df, Seq(
      ("x.com", "/*.pdf$", false), ("x.com", "/tmp*/", false)))
    assert(kept == Seq(2L, 4L, 5L), s"kept: $kept")
  }

  test("filterDisallowed: rule hosts are canonicalized (www./default port)") {
    val df = Seq(
      (1L, "https://example.com/p"),
      (2L, "https://www.example.com/p"))
    // rule recorded under the www + port form must match both
    val kept = disallowKept(df, Seq(("www.example.com:443", "/p", false)))
    assert(kept.isEmpty, s"kept: $kept")
  }

  test("filterDisallowed matches the percent-normalized path") {
    val df = Seq(
      (1L, "https://x.com/%7Euser/docs"),  // %7E -> ~ : blocked by /~user
      (2L, "https://x.com/~user/docs"),    // literal twin: also blocked
      (3L, "https://x.com/other"))
    val kept = disallowKept(df, Seq(("x.com", "/~user", false)))
    assert(kept == Seq(3L), s"kept: $kept")
  }

  test("canonicalizeUrl: percent-encoding normalization") {
    // unreserved escapes decode
    assert(canon("https://example.com/%7Euser/%70") ==
      "https://example.com/~user/p")
    // reserved escapes stay escaped but uppercase
    assert(canon("https://example.com/a%2fb") == "https://example.com/a%2Fb")
    // malformed escapes pass through verbatim
    assert(canon("https://example.com/a%9z?b=%") ==
      "https://example.com/a%9z?b=%")
    // already-canonical escapes are a fixpoint
    assert(canon("https://example.com/a%2Fb") == "https://example.com/a%2Fb")
    // pct-encoded and literal twins meet at the same canonical form
    assert(canon("https://example.com/%70/1?x=%2f&Y=%7e") ==
      canon("https://example.com/p/1?Y=~&x=%2F"))
  }

  test("registrableChain: stops at the registrable domain (PSL)") {
    import spark.implicits._
    def chain(h: String): Seq[String] =
      Seq(h).toDF("h").select(UrlOps.registrableChain(col("h")))
        .head().getSeq[String](0)
    assert(chain("cdn.media.example.co.uk") ==
      Seq("cdn.media.example.co.uk", "media.example.co.uk", "example.co.uk"))
    assert(chain("a.b.example.com") ==
      Seq("a.b.example.com", "b.example.com", "example.com"))
    // every blogspot site is its own registrable domain
    assert(chain("foo.blogspot.com") == Seq("foo.blogspot.com"))
    // a host that IS a public suffix degenerates to itself
    assert(chain("co.uk") == Seq("co.uk"))
    // single label: implicit-* fallback, same as domainChain
    assert(chain("localhost") == Seq("localhost"))
    // non-default port stripped before chaining
    assert(chain("example.co.uk:8080") == Seq("example.co.uk"))
  }

  test("filterBlockedDomainsPsl: a public-suffix entry blocks nothing") {
    import spark.implicits._
    val df = Seq(
      (1L, "a.example.co.uk"),   // blocked: example.co.uk listed
      (2L, "other.co.uk"),       // NOT blocked: 'co.uk' is a public suffix
      (3L, "x.blogspot.com"),    // NOT blocked: 'blogspot.com' is PSL-private
      (4L, "bad.com"),           // blocked: exact
      (5L, "sub.bad.com")).toDF("doc_id", "host")
    val block = Seq("example.co.uk", "co.uk", "blogspot.com", "bad.com")
      .toDF("domain")
    val kept = UrlOps.filterBlockedDomainsPsl(df, "host", "doc_id", block)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L, 3L), s"kept: $kept")
  }

  test("sitemapUrls: entity decode, whitespace trim, canonical loc, loc-less drop, lastmod null") {
    import spark.implicits._
    val xml =
      """<?xml version="1.0"?><urlset>
        |<url><loc>https://a.com/x?p=1&amp;q=2</loc><lastmod>2024-01-05</lastmod></url>
        |<url><loc>
        |   HTTP://WWW.A.com:80/y/
        |</loc></url>
        |<url><lastmod>2024-02-02</lastmod></url>
        |</urlset>""".stripMargin
    val got = UrlOps.sitemapUrls(Seq((7L, xml)).toDF("doc_id", "xml"),
        "xml", "doc_id")
      .orderBy("url").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSeq
    assert(got == Seq(
      (7L, "http://a.com/y", None),                         // trimmed + canonicalized, no lastmod
      (7L, "https://a.com/x?p=1&q=2", Some("2024-01-05"))), // &amp; decoded before canon
      got)
  }

  test("resolveRedirects: chains, loops, hop cap, functional-map normalization") {
    import spark.implicits._
    val redirects = Seq(
      ("a", "b"), ("b", "c"),            // 2-hop chain: a->c(2), b->c(1)
      ("x", "y"), ("y", "x"),            // 2-cycle: both unresolved
      ("d", "e"), ("d", "z"),            // conflicting records: min(dst)=e wins
      ("p1", "p2"), ("p2", "p3"), ("p3", "p4"), ("p4", "p5")) // 4-hop; cap=3 cuts p1
      .toDF("src", "dst")
    val got = UrlOps.resolveRedirects(redirects, maxHops = 3)
      .collect()
      .map(r => r.getString(0) -> (Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got == Map(
      "a" -> (Some("c"), Some(2L)),
      "b" -> (Some("c"), Some(1L)),
      "x" -> (None, None), "y" -> (None, None),
      "d" -> (Some("e"), Some(1L)),
      "p1" -> (None, None),               // 4 hops needed, cap 3
      "p2" -> (Some("p5"), Some(3L)),
      "p3" -> (Some("p5"), Some(2L)),
      "p4" -> (Some("p5"), Some(1L))), got)
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

  private val robotsBody =
    "# policy\nUser-agent: graftbot\nDisallow: /private\nAllow: /private/ok\n" +
      "Crawl-delay: 2\n\nUser-agent: *\r\nUser-Agent: other\r\nDisallow: /\r\n" +
      "crawl-delay: 0.5\nSitemap: https://h.com/s.xml\nUser-agent: star2\n" +
      "Disallow: /x # comment\nDisallow:\nCrawl-delay: junk\n"

  test("parseRobotsRules: agent-specific group binds alone; star fallback; CRLF/comments/case; empty patterns dropped") {
    import spark.implicits._
    val robots = Seq(("www.H.com:443", robotsBody)).toDF("host", "robots_txt")
    // graftbot names a group -> ONLY that group binds
    val bot = UrlOps.parseRobotsRules(robots, agent = "graftbot")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(bot == Set(("h.com", "/private", false), ("h.com", "/private/ok", true)), bot)
    // unknown agent -> the star groups bind (both: the multi-UA group
    // AND star2's group, which the Sitemap line must NOT have split)
    val other = UrlOps.parseRobotsRules(robots, agent = "nobody")
      .collect().map(r => (r.getString(1), r.getBoolean(2))).toSet
    assert(other == Set(("/", false)), other) // star2 is not '*': only the '*' group
    val star2 = UrlOps.parseRobotsRules(robots, agent = "star2")
      .collect().map(r => (r.getString(1), r.getBoolean(2))).toSet
    assert(star2 == Set(("/x", false)), star2) // comment stripped, empty Disallow dropped
  }

  test("robotsRulesWithStatus: 4xx drops rules, 5xx/unreachable synthesizes Disallow /, live parses") {
    import spark.implicits._
    val body = "User-agent: *\nDisallow: /blocked\n"
    val fetch = Seq(
      ("live.com", body, Some(200)),
      ("redirected.com", body, Some(301)),
      ("gone.com", body, Some(404)),      // rules must DROP (allow-all)
      ("down.com", body, Some(503)),      // full disallow
      ("dark.com", body, None))           // unreachable -> full disallow
      .toDF("host", "robots_txt", "status")
    val got = UrlOps.robotsRulesWithStatus(fetch)
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(got == Set(
      ("live.com", "/blocked", false),
      ("redirected.com", "/blocked", false),
      ("down.com", "/", false),
      ("dark.com", "/", false)), got)
    // delays inherit the same status rule: only live hosts contribute
    val delayFetch = Seq(
      ("live.com", "User-agent: *\nCrawl-delay: 2\n", Some(200)),
      ("gone.com", "User-agent: *\nCrawl-delay: 9\n", Some(404)))
      .toDF("host", "robots_txt", "status")
    val delays = UrlOps.crawlDelaysWithStatus(delayFetch)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(delays == Set(("live.com", 2.0)), delays)
  }

  /** Independent driver-side reference implementation of the RFC 9309
    * group semantics — a SECOND implementation (plain Scala fold, no
    * Spark, no shared code with the operator) for the property check:
    * the distributed window-function parse must agree with it on
    * arbitrary generated bodies.
    */
  private def referenceRobotsParse(body: String, agent: String): Set[(String, Boolean)] = {
    val recognized = Set("user-agent", "allow", "disallow", "crawl-delay")
    val directives = body.split("\n", -1).toSeq
      .map(_.stripSuffix("\r").takeWhile(_ != '#').trim)
      .flatMap { l =>
        val i = l.indexOf(':')
        if (i < 0) None
        else {
          val k = l.substring(0, i).trim.toLowerCase
          if (recognized(k)) Some(k -> l.substring(i + 1).trim) else None
        }
      }
    // group ids: a user-agent line NOT preceded by a user-agent line opens a group
    case class St(gid: Int, prevUa: Boolean, rows: Vector[(Int, String, String)])
    val st = directives.foldLeft(St(0, prevUa = false, Vector.empty)) {
      case (s, (k, v)) =>
        val ua = k == "user-agent"
        val gid = if (ua && !s.prevUa) s.gid + 1 else s.gid
        St(gid, ua, s.rows :+ ((gid, k, v)))
    }
    val groups = st.rows.groupBy(_._1)
    val agentGroups = groups.filter(_._2.exists {
      case (_, k, v) => k == "user-agent" && v.toLowerCase == agent.toLowerCase })
    val binding =
      if (agentGroups.nonEmpty) agentGroups
      else groups.filter(_._2.exists { case (_, k, v) => k == "user-agent" && v == "*" })
    binding.values.flatten.collect {
      case (_, k, v) if (k == "allow" || k == "disallow") && v.nonEmpty =>
        (v, k == "allow")
    }.toSet
  }

  test("parseRobotsRules agrees with an independent reference parser on generated bodies") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val uaNames = Gen.oneOf("*", "graftbot", "otherbot", "MixedBot")
    val patterns = Gen.oneOf("/", "/a", "/a/*", "/b$", "", "/p q")
    val line: Gen[String] = Gen.frequency(
      3 -> uaNames.map("User-agent: " + _),
      2 -> patterns.map("Disallow: " + _),
      2 -> patterns.map("Allow: " + _),
      1 -> Gen.const("Crawl-delay: 2"),
      1 -> Gen.const("Sitemap: https://x.com/s.xml"),
      1 -> Gen.const("# a comment line"),
      1 -> Gen.const(""),
      1 -> Gen.const("junk without a colon"))
    val body = Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, line))
      .map(_.mkString("\n"))
    val prop = Prop.forAll(body, Gen.oneOf("graftbot", "*", "nobody")) {
      (b, agent) =>
        val got = UrlOps.parseRobotsRules(
            Seq(("h.com", b)).toDF("host", "robots_txt"), agent = agent)
          .collect().map(r => (r.getString(1), r.getBoolean(2))).toSet
        got == referenceRobotsParse(b, agent)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("crawlDelays: binding group's numeric delay; junk dropped; min collapse") {
    import spark.implicits._
    val robots = Seq(("h.com", robotsBody)).toDF("host", "robots_txt")
    val bot = UrlOps.crawlDelays(robots, agent = "graftbot")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(bot == Seq(("h.com", 2.0)), bot)
    val any = UrlOps.crawlDelays(robots, agent = "nobody")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(any == Seq(("h.com", 0.5)), any) // star group's 0.5; star2's junk dropped
  }

  test("recrawlPriorities: changed and new pages high, stable pages low, canonical-keyed compare") {
    import spark.implicits._
    val prev = Seq(
      ("https://a.com/1", "same text"),
      ("https://WWW.A.com:443/2/", "old text")) // canonical match despite surface form
      .toDF("url", "text")
    val cur = Seq(
      (1L, "https://a.com/1", "same text"),   // stable
      (2L, "https://a.com/2", "new text"),    // changed (canonical matches prev row 2)
      (3L, "https://a.com/3", "whatever"))    // new page
      .toDF("doc_id", "url", "text")
    val got = UrlOps.recrawlPriorities(cur, prev, "url", "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(1L -> 0.1, 2L -> 1.0, 3L -> 1.0), got)
  }

  test("robotsSitemaps: group-independent, host-canonicalized, absolute-only, distinct") {
    import spark.implicits._
    val body = "User-agent: a\nSitemap: https://h.com/a.xml # inside a group\n" +
      "Disallow: /\nSitemap: https://h.com/a.xml\r\n" + // duplicate + CRLF
      "sitemap: https://h.com/b.xml\nSitemap: /relative/ignored.xml\nSitemap:\n"
    val got = UrlOps.robotsSitemaps(Seq(("WWW.H.com:443", body)).toDF("host", "robots_txt"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("h.com", "https://h.com/a.xml"), ("h.com", "https://h.com/b.xml")), got)
  }

  test("sitemapEntries: priority clamped to [0,1], spec default 0.5 for absent/junk") {
    import spark.implicits._
    val xml = """<urlset>
      |<url><loc>https://a.com/1</loc><priority>0.9</priority></url>
      |<url><loc>https://a.com/2</loc></url>
      |<url><loc>https://a.com/3</loc><priority>garbage</priority></url>
      |<url><loc>https://a.com/4</loc><priority>1.7</priority></url>
      |</urlset>""".stripMargin
    val got = UrlOps.sitemapEntries(Seq((1L, xml)).toDF("k", "xml"), "xml", "k")
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(got == Map(
      "https://a.com/1" -> 0.9, "https://a.com/2" -> 0.5,
      "https://a.com/3" -> 0.5, "https://a.com/4" -> 1.0), got)
  }

  test("frontierBudget: waves past the per-host cap are cut, other hosts unaffected") {
    import spark.implicits._
    val frontier = Seq(
      (1L, "https://a.com/1", 3L), (2L, "https://a.com/2", 2L),
      (3L, "https://a.com/3", 1L), (4L, "https://b.com/1", 0L))
      .toDF("id", "url", "prio")
    val delays = Seq.empty[(String, Double)].toDF("host", "delay_s")
    val got = UrlOps.frontierBudget(frontier, "url", "id", "prio", delays,
        maxPerHost = 2)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L), got) // a.com keeps its top 2; b.com untouched
  }

  test("frontierSchedule is partition-invariant: same waves under any input partitioning") {
    import spark.implicits._
    val rows = (1L to 40L).map(i =>
      (i, s"https://h${i % 4}.com/p/$i", i % 7))
    val delays = Seq(("h1.com", 2.0)).toDF("host", "delay_s")
    def run(parts: Int) = UrlOps.frontierSchedule(
        rows.toDF("id", "url", "prio").repartition(parts),
        "url", "id", "prio", delays)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(run(1) == run(7), "wave assignment depends on input partitioning")
  }

  test("frontierSchedule: per-host waves rank by priority, offsets multiply the host delay, default for robots-less hosts") {
    import spark.implicits._
    val frontier = Seq(
      (1L, "https://a.com/1", 0L), (2L, "https://a.com/2", 9L),
      (3L, "https://a.com/3", 5L), (4L, "https://b.com/1", 1L))
      .toDF("id", "url", "prio")
    val delays = Seq(("a.com", 2.5)).toDF("host", "delay_s")
    val got = UrlOps.frontierSchedule(frontier, "url", "id", "prio", delays)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      2L -> (("a.com", 0L, 0L)),     // highest priority fetches first
      3L -> (("a.com", 1L, 2500L)),  // wave x 2500ms
      1L -> (("a.com", 2L, 5000L)),
      4L -> (("b.com", 0L, 0L))), got)
  }

  test("sitemapIndexChildren: child locs canonical, loc-less drop, root tag never matches") {
    import spark.implicits._
    val idx = Seq((1L,
      "<sitemapindex><sitemap><loc>\n HTTPS://WWW.A.com:443/s/1.xml \n</loc>" +
        "<lastmod>2024-05-01</lastmod></sitemap>" +
        "<sitemap><loc>https://a.com/s/2.xml?x=1&amp;y=2</loc></sitemap>" +
        "<sitemap><lastmod>2024-06-01</lastmod></sitemap></sitemapindex>"))
      .toDF("doc_id", "xml")
    val got = UrlOps.sitemapIndexChildren(idx, "xml", "doc_id")
      .collect().map(_.getString(1)).toSet
    // the <sitemapindex> ROOT tag must not be swallowed as a <sitemap>
    // block (no word boundary inside 'sitemapindex'), so exactly the
    // two loc-bearing children come out, canonical
    assert(got == Set("https://a.com/s/1.xml",
      "https://a.com/s/2.xml?x=1&y=2"), got)
  }

  test("sitemapUrlsViaIndex: one-level resolution keyed by the index; unstaged children contribute nothing") {
    import spark.implicits._
    val pool = Seq(
      // the index (key 10) references two children, one of them unstaged
      (10L, "https://a.com/sitemap.xml",
        "<sitemapindex><sitemap><loc>https://a.com/s/a.xml</loc></sitemap>" +
          "<sitemap><loc>HTTPS://WWW.A.com/s/b.xml</loc></sitemap>" +
          "<sitemap><loc>https://a.com/s/missing.xml</loc></sitemap>" +
          "</sitemapindex>"),
      // staged children carry their OWN keys — output must use the index's
      (20L, "https://a.com/s/a.xml",
        "<urlset><url><loc>https://a.com/u/1</loc>" +
          "<lastmod>2024-01-01</lastmod></url></urlset>"),
      (30L, "https://www.a.com/s/b.xml",
        "<urlset><url><loc>https://a.com/u/2</loc></url></urlset>"))
      .toDF("doc_id", "url", "xml")
    val got = UrlOps.sitemapUrlsViaIndex(pool, "url", "xml", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSet
    assert(got == Set(
      (10L, "https://a.com/u/1", Some("2024-01-01")),
      (10L, "https://a.com/u/2", None)), got)
  }
}
