package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class TextExtractionSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def strip(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h")
      .select(TextExtraction.stripHtml(col("h"))).head().getString(0)
  }

  private def main(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h")
      .select(TextExtraction.mainContent(col("h"))).head().getString(0)
  }

  test("stripHtml: tags, blocks, comments, entities, whitespace — rule by rule") {
    assert(strip("<p>plain</p>") == "plain")
    // script/style contents are DROPPED, not just untagged — multi-line too
    assert(strip("a<script>var x = '<b>not text</b>';\nmore();</script>b") == "a b")
    assert(strip("a<style>p { color: red }\n.c{}</style>b") == "a b")
    assert(strip("a<SCRIPT SRC=\"x.js\">ignored()</SCRIPT>b") == "a b") // case + attrs
    assert(strip("a<!-- hidden\ncomment -->b") == "a b")
    // entities: the five predefined, double-encoded decodes ONE level
    assert(strip("1 &lt; 2 &amp;&amp; &quot;q&#39;s&quot;&nbsp;end") ==
      "1 < 2 && \"q's\" end")
    assert(strip("&amp;lt;") == "&lt;")
    // named entities decode via the derived table; truly unknown names
    // pass through untouched (documented scope)
    assert(strip("a &middot; b") == "a · b")
    assert(strip("a &notaname; b") == "a &notaname; b")
    // whitespace runs (incl. newlines from stripped block tags) collapse
    assert(strip("<div>a</div>\n\n  <div>b</div>") == "a b")
    // unclosed/stray angle brackets: tag regex eats only real tags
    assert(strip("5 > 3 and <b>bold</b>") == "5 > 3 and bold")
  }

  test("mainContent keeps the content paragraph, drops nav/footer/short lines") {
    val page = Seq(
      "<html><head><title>T</title><script>var a=1;</script></head>",
      "<div><a href=\"/\">Home</a> <a href=\"/x\">About</a> <a href=\"/y\">Contact</a></div>",
      "<p>This paragraph easily clears the twenty-five character floor and has no anchors at all.</p>",
      "<div class=\"f\"><a href=\"/t\">Terms</a> <a href=\"/p\">Privacy</a></div>").mkString("\n")
    assert(main(page) ==
      "This paragraph easily clears the twenty-five character floor and has no anchors at all.")
    // a long LINK LIST fails on density even though it clears the length floor
    val linkList = "<li><a href=\"/1\">alpha beta</a></li> <li><a href=\"/2\">gamma delta</a></li> " +
      "<li><a href=\"/3\">epsilon zeta</a></li> <li><a href=\"/4\">eta theta</a></li>"
    assert(main(linkList) == "")
    // two qualifying lines reassemble in order, newline-joined
    val two = "<p>First content line with clearly enough characters here.</p>\n" +
      "<p>Second content line, also clearly long enough to keep.</p>"
    assert(main(two) ==
      "First content line with clearly enough characters here.\n" +
        "Second content line, also clearly long enough to keep.")
    // an anchor INSIDE prose survives: one link, many words
    val prose = "<p>Prose that cites <a href=\"/ref\">one reference</a> while " +
      "staying far below the density threshold for boilerplate.</p>"
    assert(main(prose).startsWith("Prose that cites one reference"))
  }

  test("mainContent is minification-invariant: single-line pages segment at block boundaries") {
    val page = Seq(
      "<html><head><title>T</title><script>var a=1;</script></head>",
      "<div><a href=\"/\">Home</a> <a href=\"/x\">About</a> <a href=\"/y\">Contact</a></div>",
      "<p>This paragraph easily clears the twenty-five character floor and has no anchors at all.</p>",
      "<div class=\"f\"><a href=\"/t\">Terms</a> <a href=\"/p\">Privacy</a></div>").mkString("\n")
    val minified = page.replace("\n", "")
    assert(main(minified) == main(page),
      s"minified='${main(minified)}' formatted='${main(page)}'")
    // and the value is the content, not empty (the pre-minification
    // failure mode was a whole-page pass/fail)
    assert(main(minified).startsWith("This paragraph"))
    // <br> and headings are boundaries too
    val br = "<h1>Tiny</h1><p>A first long paragraph with more than enough " +
      "characters.<br>A second long paragraph, also with plenty of characters.</p>"
    assert(main(br) ==
      "A first long paragraph with more than enough characters.\n" +
        "A second long paragraph, also with plenty of characters.")
  }

  test("stripHtml decodes numeric character references in the ASCII+nbsp range") {
    assert(strip("say &#72;i&#x21;") == "say Hi!")
    assert(strip("a&#160;b") == "a b")           // nbsp-class -> space
    assert(strip("tab&#9;lf&#10;cr&#13;end") == "tab lf cr end")
    assert(strip("keep &#999; verbatim") == "keep &#999; verbatim") // out of range
    assert(strip("hex upper &#X41; too") == "hex upper A too")
    assert(strip("malformed &#x; and &# stay") == "malformed &#x; and &# stay")
    // double-encoded decodes ONE level, consistent with &amp;-last
    assert(strip("&amp;#39;") == "&#39;")
  }

  test("stripHtml decodes named entities from the derived table; unknown names pass through") {
    assert(strip("caf&eacute; r&eacute;sum&eacute;") == "café résumé")
    assert(strip("A&ndash;B &mdash; C&hellip;") == "A–B — C…")
    assert(strip("&Ouml;l vs &ouml;l") == "Öl vs öl") // case-sensitive names
    assert(strip("5&nbsp;km") == "5 km")               // nbsp -> plain space
    assert(strip("&euro;9 &copy; x &middot; y") == "€9 © x · y")
    assert(strip("keep &bogus; and &eacute and & alone") ==
      "keep &bogus; and &eacute and & alone")          // unknown / no ';' / bare &
    // one-level decode for double-encoded named refs
    assert(strip("&amp;eacute;") == "&eacute;")
    // adjacent entities, and an entity hard against a tag boundary
    assert(strip("<b>&lt;&eacute;&gt;</b>") == "<é>")
  }

  test("entity decode round-trips an HTML escaper on generated text (one level, bulk)") {
    import org.scalacheck.Gen
    import spark.implicits._
    val tokenGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("&", "<", ">", "\"", "'", "q&a", "a<b", "5>4", "&&", "&x"))
    val texts = Gen.listOfN(300, Gen.listOf(tokenGen).map(_.mkString(" ")))
      .sample.get
    // the standard serializer: escape & FIRST, then the other four
    def escape(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;").replace("'", "&#39;")
    def collapse(s: String) = s.replaceAll("\\s+", " ").trim
    val got = texts.map(escape).zipWithIndex.map(_.swap).toDF("i", "h")
      .select(col("i"), TextExtraction.stripHtml(col("h")).as("t"))
      .orderBy("i").collect().map(_.getString(1))
    texts.map(collapse).zip(got).zipWithIndex.foreach { case ((exp, g), i) =>
      assert(g == exp, s"case $i: '${texts(i)}' -> '${escape(texts(i))}' -> '$g' != '$exp'")
    }
  }

  private def flags(html: String): (Boolean, Boolean) = {
    import spark.implicits._
    val r = Seq(html).toDF("h").select(
      TextExtraction.metaNoindex(col("h")),
      TextExtraction.metaNofollow(col("h"))).head()
    (r.getBoolean(0), r.getBoolean(1))
  }

  test("metaNoindex/metaNofollow: both attribute orders, quote styles, case, and 'none' implies both") {
    assert(flags("""<head><meta name="robots" content="noindex, nofollow"></head>""") == ((true, true)))
    assert(flags("""<meta content="NOFOLLOW" name="ROBOTS">""") == ((false, true)))
    assert(flags("<meta name='robots' content='none'>") == ((true, true)))
    assert(flags("""<meta name="robots" content="index, follow">""") == ((false, false)))
    assert(flags("no meta at all") == ((false, false)))
    // token, not substring: 'noindexing' must not match
    assert(flags("""<meta name="robots" content="noindexing">""") == ((false, false)))
    // a robots meta for a DIFFERENT agent name does not match
    assert(flags("""<meta name="googlebot" content="noindex">""") == ((false, false)))
  }

  test("canonicalLinkHref: both attribute orders; absent/empty is null") {
    import spark.implicits._
    def href(html: String): Option[String] = {
      val r = Seq(html).toDF("h")
        .select(TextExtraction.canonicalLinkHref(col("h"))).head()
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }
    assert(href("""<link rel="canonical" href="https://a.com/x">""") == Some("https://a.com/x"))
    assert(href("""<link href='/y' rel='canonical'>""") == Some("/y"))
    assert(href("""<link rel="stylesheet" href="/s.css">""") == None)
    assert(href("""<link rel="canonical" href="">""") == None)
  }

  test("consolidateByCanonical: declared targets group print/session variants; undeclared pages stand alone") {
    import spark.implicits._
    val pages = Seq(
      (1L, "https://a.com/article", """<link rel="canonical" href="https://a.com/article">"""),
      (2L, "https://a.com/article?print=1", """<link rel="canonical" href="https://a.com/article">"""),
      (3L, "https://WWW.A.com:443/amp/article", """<link href="/article" rel='canonical'>"""),
      (4L, "https://a.com/other", "no declaration")).toDF("doc_id", "url", "html")
    val got = UrlOps.consolidateByCanonical(pages, "url", "html", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(
      ("https://a.com/article", 1L),  // 1,2,3 all collapse; min key wins
      ("https://a.com/other", 4L)), got)
  }

  test("consolidateByCanonical: cross-site declarations fall back to self; same registrable domain still consolidates") {
    import spark.implicits._
    val pages = Seq(
      // the hijack: a page on evil.net claiming a.com's article
      (1L, "https://evil.net/clone", """<link rel="canonical" href="https://a.com/article">"""),
      (2L, "https://a.com/article", """<link rel="canonical" href="https://a.com/article">"""),
      // legitimate cross-SUBDOMAIN declaration (same registrable domain)
      (3L, "https://cdn.media.a.com/article", """<link rel="canonical" href="https://a.com/article">"""),
      // PSL tier: co.uk is a public suffix, so x.co.uk and y.co.uk are
      // DIFFERENT sites even though their last two labels match
      (4L, "https://x.co.uk/p", """<link rel="canonical" href="https://y.co.uk/p">"""),
      (5L, "https://y.co.uk/p", "")).toDF("doc_id", "url", "html")
    val got = UrlOps.consolidateByCanonical(pages, "url", "html", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(
      ("https://evil.net/clone", 1L),   // hijack ignored: self-target
      ("https://a.com/article", 2L),    // 2 and 3 consolidate, min key
      ("https://x.co.uk/p", 4L),        // cross-registrable under a PSL suffix
      ("https://y.co.uk/p", 5L)), got)
  }

  test("consolidateByCanonical: fragment-only, userinfo and trailing-dot " +
      "declared targets still pass the same-site guard") {
    import spark.implicits._
    val pages = Seq(
      // declared canonical = path-less URL + fragment: the host scan
      // must stop at '#', not swallow it into the authority
      (1L, "https://a.com/p?s=1", """<link rel="canonical" href="https://a.com#top">"""),
      // userinfo in the declared authority: strip up to '@'
      (2L, "https://a.com/q?s=2", """<link rel="canonical" href="https://user:pw@a.com/q">"""),
      // trailing root-label dot: a.com. ≡ a.com
      (3L, "https://a.com/r?s=3", """<link rel="canonical" href="https://a.com./r">"""),
      (4L, "https://a.com/q", "")).toDF("doc_id", "url", "html")
    val got = UrlOps.consolidateByCanonical(pages, "url", "html", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // all three declarations are SAME-SITE (a.com), so the DECLARED
    // target wins — a guard that mis-scanned the authority would fall
    // back to the self URLs (…/p?s=1 etc.) instead
    assert(got == Set(
      ("https://a.com", 1L),
      ("https://user:pw@a.com/q", 2L),
      ("https://a.com./r", 3L),
      ("https://a.com/q", 4L)), got)
  }
}
