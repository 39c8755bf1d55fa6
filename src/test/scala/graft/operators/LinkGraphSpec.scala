package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class LinkGraphSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("extractLinks: quote styles, resolution scope, canonicalization, dedup, self-loops") {
    import spark.implicits._
    val pages = Seq(
      ("http://www.A.com:80/page/1#frag",
        """<p><a href="HTTPS://Other.COM/x/">double</a>
          |<a href='/rel'>single-quoted root-relative</a>
          |<a href="mailto:a@b.c">mail</a>
          |<a href="#top">fragment-only</a>
          |<a href="doc.html">dir-relative</a>
          |<a href="javascript:void(0)">js</a>
          |<a href="">empty</a>
          |<a href="HTTPS://Other.COM/x/?utm_source=z">dup after canon</a>
          |<a href="http://a.com/page/1">self after canon</a></p>""".stripMargin))
      .toDF("url", "html")
    val edges = LinkGraph.extractLinks(pages, "url", "html")
      .orderBy("dst").collect().map(r => (r.getString(0), r.getString(1)))
    // src canonicalizes (www/port/fragment gone); dup + self-loop collapse
    assert(edges.toSeq == Seq(
      ("http://a.com/page/1", "http://a.com/page/doc.html"), // dir-relative
      ("http://a.com/page/1", "http://a.com/rel"),      // page scheme kept
      ("http://a.com/page/1", "https://other.com/x")),  // canonical target
      s"edges: ${edges.toSeq}")
  }

  test("extractLinksWithRel: attribute-order-free nofollow; any followed copy endorses") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.com/p", "<p>" +
        "<a href=\"https://b.com/x\">followed</a> " +
        "<a href=\"https://c.com/y\" rel=\"nofollow\">rel after</a> " +
        "<a rel='ugc nofollow' href='https://d.com/z'>rel before, multi-token</a> " +
        "<a href=/e rel=nofollow>unquoted both</a> " +
        // nofollow token must match whole-token, not substring
        "<a href=\"https://f.com/w\" rel=\"nofollowish\">not the token</a> " +
        // ...including in the UNQUOTED rel form (word boundary on both
        // sides of the unquoted alternative, same as the quoted ones)
        "<a href=\"https://g.com/v\" rel=nofollowish>unquoted non-token</a> " +
        "<a href=\"https://h.com/u\" rel=prenofollow>unquoted prefix junk</a> " +
        // duplicate of c.com/y WITHOUT rel: the pair collapses to followed
        "<a href=\"https://c.com/y\">endorsing dup</a></p>"))
      .toDF("url", "html")
    val got = LinkGraph.extractLinksWithRel(pages, "url", "html")
      .collect().map(r => (r.getString(1), r.getBoolean(2))).toSet
    assert(got == Set(
      ("https://b.com/x", false),
      ("https://c.com/y", false),   // endorsing dup wins
      ("https://d.com/z", true),
      ("https://a.com/e", true),
      ("https://f.com/w", false),
      ("https://g.com/v", false),
      ("https://h.com/u", false)), got)
    val followed = LinkGraph.followedLinks(pages, "url", "html")
      .collect().map(_.getString(1)).toSet
    assert(followed == Set("https://b.com/x", "https://c.com/y",
      "https://f.com/w", "https://g.com/v", "https://h.com/u"), followed)
  }

  test("pagerank early stop at exact fixpoint is result-identical to fixed iterations") {
    import spark.implicits._
    // a 2-cycle: uniform ranks are the exact fixpoint from iteration 1
    // on, so the delta-0 stop fires early — and must reproduce the
    // 10-iteration result bit for bit
    val edges = Seq(
      ("https://a.com/1", "https://b.com/1"),
      ("https://b.com/1", "https://a.com/1")).toDF("src", "dst")
    def run(iters: Int) = LinkGraph.pagerank(edges, iters = iters)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(run(10) == run(1), "fixpoint early stop diverged from fixed iters")
    // uniform split of the fixed-point total across the 2 nodes
    assert(run(1) == Set(
      ("https://a.com/1", 500000000000L),
      ("https://b.com/1", 500000000000L)))
  }

  test("personalizedPagerank: teleport lands on seeds only; unreachable nodes go to 0; all-seeds equals classic") {
    import spark.implicits._
    // s -> a -> b, plus an island (c -> d) no seed can reach
    val edges = Seq(
      ("https://s.com/1", "https://a.com/1"),
      ("https://a.com/1", "https://b.com/1"),
      ("https://c.com/1", "https://d.com/1")).toDF("src", "dst")
    val seeds = Seq("https://s.com/1").toDF("url")
    val ppr = LinkGraph.personalizedPagerank(edges, seeds, iters = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // the island receives no teleport and no seed-reachable inflow
    assert(ppr("https://c.com/1") == 0L, ppr)
    // d still decays to 0 once c's initial mass drains (8 iters)
    assert(ppr("https://d.com/1") == 0L, ppr)
    // the seed holds the teleport share; its chain carries damped mass
    assert(ppr("https://s.com/1") > 0L && ppr("https://a.com/1") > 0L &&
      ppr("https://b.com/1") > 0L, ppr)
    assert(ppr("https://s.com/1") > ppr("https://b.com/1"), ppr)
    // all-nodes seed set reproduces classic pagerank exactly
    val allSeeds = edges.select(edges("src").as("url"))
      .union(edges.select(edges("dst").as("url"))).distinct()
    val asPpr = LinkGraph.personalizedPagerank(edges, allSeeds, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val classic = LinkGraph.pagerank(edges, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(asPpr == classic)
  }

  test("pagerankAgainstIndex equals the ad-hoc pagerank on the same edges") {
    import spark.implicits._
    val edges = Seq(
      ("https://a.com/1", "https://b.com/1"),
      ("https://a.com/1", "https://c.com/1"),
      ("https://b.com/1", "https://c.com/1"),
      ("https://d.com/1", "https://a.com/1")).toDF("src", "dst")
    LinkGraph.writeEdgeIndex(edges, "graft_spec_edge_idx", buckets = 4)
    try {
      val adhoc = LinkGraph.pagerank(edges, iters = 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val idx = LinkGraph.pagerankAgainstIndex(spark, "graft_spec_edge_idx",
        iters = 3).collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(adhoc == idx, s"adhoc $adhoc != idx $idx")
      val comps = LinkGraph.componentsAgainstIndex(spark, "graft_spec_edge_idx")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(comps == LinkGraph.components(edges)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet)
    } finally spark.sql("DROP TABLE IF EXISTS graft_spec_edge_idx")
  }

  test("topAnchorLabels: majority label wins; count ties break on anchor text") {
    import spark.implicits._
    val anchors = Seq(
      ("https://s1.com/a", "https://t.com/x", "docs"),
      ("https://s2.com/b", "https://t.com/x", "docs"),
      ("https://s3.com/c", "https://t.com/x", "home"),
      // tie on t.com/y: 'alpha' vs 'beta' both 1 — alpha wins (ASC)
      ("https://s1.com/a", "https://t.com/y", "beta"),
      ("https://s2.com/b", "https://t.com/y", "alpha"))
      .toDF("src", "dst", "anchor")
    val got = LinkGraph.topAnchorLabels(anchors).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("https://t.com/x", "docs", 2L),
      ("https://t.com/y", "alpha", 1L)), got)
  }

  test("extractLinks: unquoted href values (legacy/minified form)") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.com/p/1",
        // unquoted stops at whitespace or '>'; absolute, root-relative
        // and dir-relative all resolve; a quoted value never falls
        // through to the unquoted alternative
        "<a href=/r/2>root</a> <a href=HTTPS://B.com/x id=z>abs</a> " +
          "<a href=sub.html>dir</a> <a href=/r/2 class=k>dup</a> " +
          "<a href=\"/quoted\">q</a> <a href=mailto:x@y>mail</a>"))
      .toDF("url", "html")
    val edges = LinkGraph.extractLinks(pages, "url", "html")
      .orderBy("dst").collect().map(r => (r.getString(0), r.getString(1)))
    assert(edges.toSeq == Seq(
      ("https://a.com/p/1", "https://a.com/p/sub.html"),
      ("https://a.com/p/1", "https://a.com/quoted"),
      ("https://a.com/p/1", "https://a.com/r/2"),
      ("https://a.com/p/1", "https://b.com/x")),
      s"edges: ${edges.toSeq}")
  }

  test("resolveHref: dot-segment removal, above-root clamp, host-root dir") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.com/d/e/page",
        """<a href="../up.html">up</a>
          |<a href="./same.html">same</a>
          |<a href="x/../y/./z.html">mixed</a>
          |<a href="../../../../clamp.html">clamp</a>
          |<a href="tel:+1-555">tel</a>""".stripMargin),
      ("https://b.org",   // host root: empty canonical path -> dir '/'
        """<a href="rootrel.html">r</a>"""))
      .toDF("url", "html")
    val got = LinkGraph.extractLinks(pages, "url", "html")
      .orderBy("dst").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(
      ("https://a.com/d/e/page", "https://a.com/clamp.html"),
      ("https://a.com/d/e/page", "https://a.com/d/e/same.html"),
      ("https://a.com/d/e/page", "https://a.com/d/e/y/z.html"),
      ("https://a.com/d/e/page", "https://a.com/d/up.html"),
      ("https://b.org", "https://b.org/rootrel.html")), got)
  }

  test("inDegree counts distinct in-links") {
    import spark.implicits._
    val edges = Seq(("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"))
      .toDF("src", "dst")
    val deg = LinkGraph.inDegree(edges).orderBy("url")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(deg == Seq(("a", 1L), ("hub", 3L)))
  }

  test("pagerank: fixed-point iteration matches a hand-computed tiny graph") {
    import spark.implicits._
    // a -> b, b -> a, c -> a  (c has in-degree 0; no dangling nodes here)
    val edges = Seq(("a", "b"), ("b", "a"), ("c", "a")).toDF("src", "dst")
    val got = LinkGraph.pagerank(edges, iters = 1, dampingPct = 85)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val T = LinkGraph.FixedPointTotal
    val r0 = T / 3                       // 333333333333
    val base = ((100L - 85L) * (T / 3)) / 100L
    // contrib(a) = r0/1 (from b) + r0/1 (from c); contrib(b) = r0/1
    val expA = base + (85L * (r0 + r0)) / 100L
    val expB = base + (85L * r0) / 100L
    val expC = base
    assert(got == Map("a" -> expA, "b" -> expB, "c" -> expC),
      s"got $got, expected a=$expA b=$expB c=$expC")
  }

  test("pagerank: dangling mass is redistributed uniformly") {
    import spark.implicits._
    // a -> b; b dangles. After one iteration the dangling share of b's
    // initial rank reaches BOTH nodes.
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val got = LinkGraph.pagerank(edges, iters = 1, dampingPct = 85)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val T = LinkGraph.FixedPointTotal
    val r0 = T / 2
    val base = (15L * (T / 2)) / 100L
    val dangShare = (85L * (r0 / 2)) / 100L
    assert(got("a") == base + dangShare, got)
    assert(got("b") == base + (85L * r0) / 100L + dangShare, got)
  }

  test("extractAnchors: group re-alignment across quote styles, collapse, empty-drop") {
    import spark.implicits._
    val pages = Seq(
      ("http://a.com/p",
        """<p><a href="https://x.com/1">first  link</a>
          |<a href='/two'>second
          |line</a>
          |<a href="https://x.com/3"><b>nested</b> empty lead</a>
          |<a href="mailto:a@b">mail text</a></p>""".stripMargin))
      .toDF("url", "html")
    val got = LinkGraph.extractAnchors(pages, "url", "html")
      .orderBy("dst").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    // the single-quoted href must pair with ITS OWN text (not a
    // neighboring match's), internal whitespace/newlines collapse,
    // the nested-markup anchor (empty leading run) and mailto drop
    assert(got == Seq(
      ("http://a.com/p", "http://a.com/two", "second line"),
      ("http://a.com/p", "https://x.com/1", "first link")), got)
  }

  test("fused rel+anchor kernel is exactly (extractRelStr, extractAnchorsStr)") {
    // the urlReport single-scan fusion must not perturb either
    // extractor's scope: same page, same src, per-family results
    // byte-identical to the standalone kernels — including the
    // documented divergence (a raw '>' inside a quoted href is visible
    // to HrefRe-based anchors but not to AnchorTagRe-based rel edges)
    val src = "http://h.org/dir/page"
    val html =
      """<a href="/one" rel="nofollow">uno</a>
        |<a rel='nofollow' href='two/rel.html'>dos  dos</a>
        |<a href="/q?a>b">gt-in-quote</a>
        |<a href="/plain">plain</a>""".stripMargin
    val fused = LinkGraph.extractRelAnchorsStr(src, html)
    assert(fused._1.toSeq == LinkGraph.extractRelStr(src, html).toSeq)
    assert(fused._2.toSeq == LinkGraph.extractAnchorsStr(src, html).toSeq)
    // and they see real content (not two empty arrays agreeing)
    assert(fused._1.nonEmpty && fused._2.nonEmpty)
    // null html: both families empty, no throw
    val nullCase = LinkGraph.extractRelAnchorsStr(src, null)
    assert(nullCase._1.isEmpty && nullCase._2.isEmpty)
  }

  test("hostGraph: host projection drops intra-host edges, counts pairs") {
    import spark.implicits._
    val edges = Seq(
      ("https://a.com/1", "https://b.com/x"),
      ("https://a.com/2", "https://b.com/y"),
      ("https://a.com/1", "https://a.com/2"), // intra-host: dropped
      ("https://b.com/x", "https://c.net/z"))
      .toDF("src", "dst")
    val got = LinkGraph.hostGraph(edges).orderBy("src_host", "dst_host")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a.com", "b.com", 2L), ("b.com", "c.net", 1L)), got)
  }

  test("components: string-keyed CC labels by min canonical URL, partition-invariant") {
    import spark.implicits._
    // two components: {a,b,c} chained, {x,y} — plus orientation noise
    val edges = Seq(
      ("https://b.com/", "https://a.com/"),
      ("https://b.com/", "https://c.com/"),
      ("https://y.org/", "https://x.org/"))
      .toDF("src", "dst")
    val one = LinkGraph.components(edges.coalesce(1))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val many = LinkGraph.components(edges.repartition(5))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(one == many, "components must not depend on partitioning")
    assert(one == Map(
      "https://a.com/" -> "https://a.com/",
      "https://b.com/" -> "https://a.com/",
      "https://c.com/" -> "https://a.com/",
      "https://x.org/" -> "https://x.org/",
      "https://y.org/" -> "https://x.org/"), one)
  }

  test("resolveHrefStr properties: ./-invariance, clamp bound, deep-traversal residual") {
    val srcs = Seq("https://a.com/d1/d2/d3/page", "https://a.com/p", "https://a.com")
    val names = Seq("x.html", "a/b.html", "q")
    for (s <- srcs; h <- names) {
      assert(LinkGraph.resolveHrefStr(s, "./" + h) ==
        LinkGraph.resolveHrefStr(s, h), (s, h))
      // traversal within the documented bound (src depth + 4 clamps;
      // 0..4 is safe for every src here) leaves no residual dot segment
      for (d <- 0 to 4) {
        val r = LinkGraph.resolveHrefStr(s, ("../" * d) + h)
        assert(r != null && !r.contains("/./") && !r.contains("/../"),
          (s, d, h, r))
        assert(r.startsWith("https://a.com/"), (s, d, h, r))
      }
    }
    // past the documented depth bound the residual dots stay VERBATIM
    // (visible, not silently mangled)
    val deep = LinkGraph.resolveHrefStr("https://a.com/p", "../" * 20 + "x")
    assert(deep.contains("/../"), deep)
    assert(deep.endsWith("/x"), deep)
  }

  test("hostSimilarity: hot-target cut precedes the pair join, rounded-jaccard band") {
    import spark.implicits._
    // u is linked from 3 hosts > maxDf=2: cut BEFORE pairing, so it
    // neither contributes pairs nor counts toward set sizes
    val edges = Seq(
      ("https://a.com/1", "https://x.io/"), ("https://a.com/1", "https://y.io/"),
      ("https://a.com/2", "https://u.io/"),
      ("https://b.com/1", "https://x.io/"), ("https://b.com/1", "https://u.io/"),
      ("https://c.com/1", "https://u.io/"))
      .toDF("src", "dst")
    val got = LinkGraph.hostSimilarity(edges, threshold = 0.4, maxDf = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    // cold sets: a={x,y}, b={x}; c has nothing left → no pair at all;
    // jaccard(a,b) = 1 / (2 + 1 - 1) = 0.5
    assert(got == Seq(("a.com", "b.com", 0.5)), got)
  }

  test("updateComponents: incremental equals from-scratch when new edges merge old components") {
    import spark.implicits._
    // yesterday: {a,b} and {x,y}; today: one edge b—x merges them, plus
    // a brand-new pair {p,q} that yesterday never saw
    val oldE = Seq(("https://b.com/", "https://a.com/"),
      ("https://y.org/", "https://x.org/")).toDF("src", "dst")
    val newE = Seq(("https://b.com/", "https://x.org/"),
      ("https://q.io/", "https://p.io/")).toDF("src", "dst")
    val inc = LinkGraph.updateComponents(LinkGraph.components(oldE), newE)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val full = LinkGraph.components(oldE.unionByName(newE))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(inc == full, s"inc $inc != full $full")
    assert(inc("https://y.org/") == "https://a.com/") // merged across days
    assert(inc("https://q.io/") == "https://p.io/")   // new-only pair
  }

  test("pagerank is partitioning-invariant (exact integer equality)") {
    import spark.implicits._
    val edges = (0L until 200L)
      .map(i => (s"n${i % 40}", s"n${(i * 7 + 3) % 40}"))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst").distinct()
    val one = LinkGraph.pagerank(edges.coalesce(1), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val many = LinkGraph.pagerank(edges.repartition(7), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one == many, "fixed-point ranks must not depend on partitioning")
    // total mass is conserved up to floor-division remainders
    val total = one.values.sum
    assert(total <= LinkGraph.FixedPointTotal &&
      total > LinkGraph.FixedPointTotal * 99L / 100L, s"total $total")
  }

  test("hits: pure hubs get authority 0, pure authorities hub 0, " +
      "symmetric hubs tie exactly, partition-invariant") {
    import spark.implicits._
    // a, b -> c -> d: a and b are pure symmetric hubs, d a pure
    // authority, c both
    val edges = Seq(
      ("https://a.com/", "https://c.com/"),
      ("https://b.com/", "https://c.com/"),
      ("https://c.com/", "https://d.com/")).toDF("src", "dst")
    val got = LinkGraph.hits(edges, iters = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val (a, b, c, dd) = (got("https://a.com/"), got("https://b.com/"),
      got("https://c.com/"), got("https://d.com/"))
    assert(a._2 == 0L && b._2 == 0L, "pure hubs must have authority 0")
    assert(dd._1 == 0L, "a pure authority must have hub 0")
    assert(a._1 == b._1 && a._1 > 0L, "symmetric hubs must tie exactly")
    assert(c._1 > 0L && c._2 > 0L, "the middle node is both")
    assert(c._2 > dd._2, "two in-links from hubs beat one")
    // exact integer equality under different partitionings
    val one = LinkGraph.hits(edges.coalesce(1), iters = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val many = LinkGraph.hits(edges.repartition(5), iters = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(one == many, "fixed-point HITS must not depend on partitioning")
    // L1 mass conservation up to floor-division remainders
    val hubSum = got.values.map(_._1).sum
    val authSum = got.values.map(_._2).sum
    assert(hubSum <= LinkGraph.HitsTotal && authSum <= LinkGraph.HitsTotal)
    assert(hubSum > LinkGraph.HitsTotal * 99L / 100L &&
      authSum > LinkGraph.HitsTotal * 99L / 100L, s"$hubSum $authSum")
  }

  test("urlReport: rank over the endorsement graph only, nofollow share, " +
      "top label; only-nofollow'd targets get NULL rank") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.com/1",
        "<a href=\"https://hub.com/x\">portal</a> " +
          "<a href=\"https://spam.com/s\" rel=\"nofollow\">junk</a>"),
      ("https://b.com/1",
        "<a href=\"https://hub.com/x\">portal</a> " +
          "<a href=\"https://hub.com/x\" rel=\"nofollow\">dup-nf</a> " +
          "<a href=\"https://spam.com/s\" rel=\"nofollow\">junk</a>"),
      ("https://c.com/1",
        "<a href=\"https://hub.com/x\" rel=\"nofollow\">other</a>"))
      .toDF("url", "html")
    val got = LinkGraph.urlReport(pages, "url", "html")
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(1)), r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    // hub.com/x: 3 in-links, one nofollow'd (c.com — b.com's dup pair
    // collapses to followed), label 'portal' (2 srcs) beats 'other' (1)
    val hub = got("https://hub.com/x")
    assert(hub._2 == 3L && hub._3 == 0.333333 && hub._4 == "portal", hub)
    assert(hub._1.nonEmpty, "endorsed target must carry a rank")
    // spam.com/s: ONLY nofollow in-links -> absent from the endorsement
    // graph -> NULL rank; share 1.0; label still reported
    val spam = got("https://spam.com/s")
    assert(spam._1.isEmpty && spam._2 == 2L && spam._3 == 1.0 &&
      spam._4 == "junk", spam)
  }

  test("pagerank lineage truncation: local and reliable checkpoint modes " +
      "are result-identical, both truncate, superseded local blocks release") {
    import spark.implicits._
    val edges = (0L until 120L)
      .map(i => (s"n${i % 30}", s"n${(i * 11 + 5) % 30}"))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst").distinct()
    def leafIsRdd(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])

    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val local = LinkGraph.pagerank(edges, iters = 4)
    assert(leafIsRdd(local),
      "default mode must return a truncated (LogicalRDD-leaf) frame")
    // only the FINAL iteration's localCheckpoint blocks may remain —
    // the 3 superseded iterations were released explicitly, not left
    // for GC + ContextCleaner (the edges/base scaffolding unpersists
    // inside pagerank already)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(leaked.size <= 1,
      s"superseded iteration blocks leaked: ${leaked.size} new persisted RDDs")
    val localRanks = local.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val dir = java.nio.file.Files.createTempDirectory("graft_pr_ckpt").toString
    val reliable = LinkGraph.pagerank(edges, iters = 4,
      checkpointDir = Some(dir))
    assert(leafIsRdd(reliable),
      "reliable mode must return a truncated (LogicalRDD-leaf) frame")
    val reliableRanks =
      reliable.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(localRanks == reliableRanks,
      "checkpoint mode must not change the fixed-point arithmetic")
    // reliable mode actually wrote iteration state to the directory
    def anyFile(f: java.io.File): Boolean =
      f.isFile || Option(f.listFiles).exists(_.exists(anyFile))
    assert(anyFile(new java.io.File(dir)),
      s"reliable checkpoint wrote nothing under $dir")
  }

  test("checkpointDir is SCOPED: a call with an explicit dir restores " +
      "the previous context-global dir; urlReport + resolveRedirects " +
      "are result-identical in both truncation modes") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = java.nio.file.Files
      .createTempDirectory("graft_ckpt_before").toString
    sc.setCheckpointDir(before)
    val prior = sc.getCheckpointDir.get
    // restoration re-derives a fresh UUID leaf under the SAME previous
    // path (setCheckpointDir appends one per call — exact restoration
    // is not expressible through the public API), so "restored" =
    // points back INTO the dir that was set before the call
    def restored(): Boolean = sc.getCheckpointDir.exists(p =>
      p == prior || p.startsWith(prior.stripSuffix("/") + "/"))

    val pages = Seq(
      ("https://a.com/1", "<a href=\"https://hub.com/x\">portal</a>"),
      ("https://b.com/1", "<a href=\"https://hub.com/x\">portal</a> " +
        "<a href=\"https://spam.com/s\" rel=\"nofollow\">junk</a>"))
      .toDF("url", "html")
    val localRep = LinkGraph.urlReport(pages, "url", "html").collect()
      .map(r => (r.getString(0), Option(r.get(1)), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    val dir = java.nio.file.Files
      .createTempDirectory("graft_report_ckpt").toString
    val reliableRep = LinkGraph.urlReport(pages, "url", "html",
        checkpointDir = Some(dir)).collect()
      .map(r => (r.getString(0), Option(r.get(1)), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    assert(localRep == reliableRep,
      "urlReport truncation mode must not change results")
    // the global mutation was scoped: the context points back INTO the
    // dir that was set BEFORE the call (the other-jobs-redirect bug)
    assert(restored(),
      s"urlReport leaked its checkpointDir: ${sc.getCheckpointDir}")

    val redirects = Seq(
      ("https://r.com/a", "https://r.com/b"),
      ("https://r.com/b", "https://t.com/1"),
      ("https://r.com/c", "https://r.com/d"),
      ("https://r.com/d", "https://r.com/c")).toDF("src", "dst")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2))))
      .sortBy(_._1).toSeq
    val localRed = norm(UrlOps.resolveRedirects(redirects, maxHops = 4))
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_redir_ckpt").toString
    val reliableRed = norm(UrlOps.resolveRedirects(redirects, maxHops = 4,
      checkpointDir = Some(dir2)))
    assert(localRed == reliableRed,
      "resolveRedirects truncation mode must not change results")
    assert(restored(),
      s"resolveRedirects leaked its checkpointDir: ${sc.getCheckpointDir}")
  }

  test("hits: per-iteration intermediates release (no persisted-RDD leak) " +
      "and the persisted rewrite is result-identical on a fixed graph") {
    import spark.implicits._
    val edges = (0L until 200L)
      .map(i => (s"https://h${i % 23}.com/p", s"https://h${(i * 7 + 3) % 23}.com/p"))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst").distinct()
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val got = LinkGraph.hits(edges, iters = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val leaked =
      spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    // only the FINAL iteration's localCheckpoint blocks may remain —
    // araw/withA/hraw and the superseded score tables all released
    assert(leaked.size <= 1,
      s"hits leaked ${leaked.size} persisted RDDs past the final scores")
    // cross-check two invariants against an independent reference run:
    // scores L1-sum to ~HitsTotal (floor-division shortfall < n), and
    // the top authority is the max-indegree node of this generator
    val aSum = got.values.map(_._2).sum
    assert(aSum <= LinkGraph.HitsTotal &&
      aSum > LinkGraph.HitsTotal - got.size,
      s"authority L1 total off: $aSum")
    val hSum = got.values.map(_._1).sum
    assert(hSum <= LinkGraph.HitsTotal &&
      hSum > LinkGraph.HitsTotal - got.size, s"hub L1 total off: $hSum")
  }
}
