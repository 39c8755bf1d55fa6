package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → training-text extraction — the stage between the crawl
  * ([[UrlOps]]) and every text operator in this library: C4 stripped
  * pages to text before any filtering, RefinedWeb's quality numbers are
  * computed on extracted main content, and boilerplate (nav bars,
  * footers, link lists) is the classic contamination source when the
  * stage is skipped.
  *
  * Everything here is pure codegen'd Catalyst expressions (regexp /
  * array lambdas — no UDF), with Java-and-RE2-portable patterns (inline
  * `(?is)` flags, non-greedy spans, NO backreferences — RE2 has none),
  * so a DuckDB oracle replays the extraction term for term.
  *
  * Deliberately out of scope (documented, not silently wrong): full
  * HTML5 parsing (malformed-tag recovery, CDATA, conditional comments),
  * numeric character references OUTSIDE the ASCII+nbsp range (decoded:
  * `&#32;`–`&#126;`, tab/LF/CR, `&#160;`; anything else passes through
  * verbatim), and DOM-aware block scoring (jusText's context-sensitive
  * pass). [[mainContent]] pre-splits at block-element boundaries
  * ([[BlockBoundaryRe]]) before its per-line heuristic, so minified
  * single-line template output segments the same way as
  * newline-formatted markup; [[stripHtml]] needs no line structure at
  * all.
  */
object TextExtraction {

  /** Closing tags (and `<br>`) that end a visual block — the pre-split
    * points [[mainContent]] inserts newlines at, so a minified page
    * (every block on one physical line) degrades to the SAME line
    * segmentation as formatted markup instead of collapsing to one
    * whole-page pass/fail. Java-and-RE2 portable; public so the oracle
    * replay interpolates the SAME pattern instead of a hand-copied twin.
    */
  val BlockBoundaryRe: String =
    "(?i)</(?:p|div|li|ul|ol|dl|dd|dt|h[1-6]|tr|table|section|article|" +
      "aside|header|footer|head|nav|blockquote|pre|figure|form)\\s*>" +
      "|<br\\s*/?>"

  /** Whole-document text extraction: drop `<script>`/`<style>` elements
    * WITH their contents and HTML comments (all possibly multi-line),
    * strip every remaining tag, decode character references — numeric
    * ([[decodeNumericRefs]]) then named ([[NamedEntityCodepoints]]:
    * the XML five + Latin-1 + punctuation, one level for
    * double-encoded text) — then collapse whitespace runs to single
    * spaces.
    */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script>", " "),
      "(?is)<style\\b[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    collapseWs(decodeEntities(regexp_replace(noBlocks, "(?s)<[^>]*>", " ")))
  }

  /** Line-structured main-content extraction (the boilerplate filter):
    * keep the lines whose extracted text is long enough
    * (`minChars`) and whose ANCHOR DENSITY — `<a>` tags per extracted
    * word — is below `maxLinkWordRatio`; navigation bars, footers and
    * link lists fail one or both. Kept lines are emitted extracted
    * (tag-stripped, entity-decoded, whitespace-collapsed), joined by
    * `\n`. Lines come from a block-boundary pre-split ([[BlockBoundaryRe]]
    * — one `regexp_replace` inserting `\n` after each closing block
    * tag) followed by the newline split, so minified and formatted
    * markup segment identically (the pre-split is idempotent on
    * already-formatted pages: the extra empty segments it creates fail
    * `minChars` and drop out). Script/style/comment spans are handled
    * per line — a span CROSSING a block boundary is out of scope with
    * the rest of non-line-structured HTML5 recovery.
    */
  def mainContent(html: Column, minChars: Int = 25,
                  maxLinkWordRatio: Double = 0.34): Column = {
    // extract each line ONCE (Catalyst does not CSE across separate
    // higher-order-function lambdas — filtering on lineText and then
    // re-deriving it in transform would run the whole regex chain twice
    // per kept line, and this is the hot operator of the crawl path):
    // transform to (anchors, text), filter on the pair, project text
    val preSplit = regexp_replace(html, BlockBoundaryRe, "$0\n")
    val extracted = transform(split(preSplit, "\n"),
      l => struct(regexp_count(l, lit("(?i)<a\\b")).as("anchors"),
        lineText(l).as("text")))
    val kept = filter(extracted, e => {
      val text = e.getField("text")
      val words = size(split(text, " "))
      (length(text) >= minChars) &&
        (e.getField("anchors").cast("double") <
          words.cast("double") * maxLinkWordRatio)
    })
    trim(array_join(transform(kept, e => e.getField("text")), "\n"))
  }

  /** One line's extracted text: [[stripHtml]] confined to the line. */
  private def lineText(line: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(line,
      "(?is)<script\\b[^>]*>.*?</script>", " "),
      "(?is)<style\\b[^>]*>.*?</style>", " "),
      "<!--.*?-->", " ")
    collapseWs(decodeEntities(regexp_replace(noBlocks, "<[^>]*>", " ")))
  }

  /** Numeric character references (`&#77;` decimal, `&#x27;` hex)
    * decoded for the ASCII range (32–126; tab/LF/CR and `&#160;`
    * decode to a space — whitespace collapses right after anyway);
    * anything outside passes through verbatim. Split on `&#`, one
    * `transform` over the segments, reassemble — map-only, and the
    * no-reference fast path short-circuits the lambda. Runs BEFORE the
    * named-entity folds: `&amp;#39;` contains no literal `&#`, so a
    * double-encoded reference correctly decodes exactly one level
    * (to `&#39;`), the same rule the `&amp;`-last ordering gives named
    * entities.
    */
  private def decodeNumericRefs(c: Column): Column = {
    val parts = split(c, "&#")
    val decoded = transform(slice(parts, lit(2), size(parts) - 1), seg => {
      val dec = regexp_extract(seg, "^([0-9]{1,7});", 1)
      val hexd = regexp_extract(seg, "^[xX]([0-9a-fA-F]{1,6});", 1)
      val code = when(dec =!= "", dec.cast("int"))
        .when(hexd =!= "", conv(hexd, 16, 10).cast("int"))
      val refLen = when(dec =!= "", length(dec) + 1)
        .otherwise(length(hexd) + 2) // 'x' + digits + ';'
      val rest = seg.substr(refLen + 1, length(seg))
      when(code.isNull, concat(lit("&#"), seg))
        .when(code.isin(9, 10, 13, 160), concat(lit(" "), rest))
        .when(code.between(32, 126), concat(chr(code.cast("bigint")), rest))
        .otherwise(concat(lit("&#"), seg))
    })
    // codegen'd contains guard: CaseWhen evaluates lazily, so text with
    // no "&#" (the common case) never pays for the split/transform
    when(!c.contains("&#"), c)
      .otherwise(concat(element_at(parts, 1), array_join(decoded, "")))
  }

  /** Named character references: the XML five plus the full Latin-1
    * set (HTML 3.2, codepoints 160–255) and the general-punctuation /
    * symbol names real text is full of (`&mdash;`, `&hellip;`,
    * `&euro;`, …). THE DATA — (name, codepoint) pairs; the replace
    * table both engines run derives from this list (the
    * `MojibakePairs` precedent: generate from codepoints, never
    * hand-type the characters). Names are case-sensitive per the HTML
    * entity table (`&Eacute;` ≠ `&eacute;`). `nbsp` decodes to a
    * PLAIN SPACE, matching the numeric decoder's whitespace-class
    * rule (code 160 → ' '); unknown names and the semicolon-less
    * legacy form (`&amp` without `;`) pass through verbatim —
    * documented scope, not silent loss.
    */
  val NamedEntityCodepoints: Seq[(String, Int)] = Seq(
    "amp" -> 38, "lt" -> 60, "gt" -> 62, "quot" -> 34, "apos" -> 39,
    // Latin-1 (160-255), codepoint order
    "nbsp" -> 160, "iexcl" -> 161, "cent" -> 162, "pound" -> 163,
    "curren" -> 164, "yen" -> 165, "brvbar" -> 166, "sect" -> 167,
    "uml" -> 168, "copy" -> 169, "ordf" -> 170, "laquo" -> 171,
    "not" -> 172, "shy" -> 173, "reg" -> 174, "macr" -> 175,
    "deg" -> 176, "plusmn" -> 177, "sup2" -> 178, "sup3" -> 179,
    "acute" -> 180, "micro" -> 181, "para" -> 182, "middot" -> 183,
    "cedil" -> 184, "sup1" -> 185, "ordm" -> 186, "raquo" -> 187,
    "frac14" -> 188, "frac12" -> 189, "frac34" -> 190, "iquest" -> 191,
    "Agrave" -> 192, "Aacute" -> 193, "Acirc" -> 194, "Atilde" -> 195,
    "Auml" -> 196, "Aring" -> 197, "AElig" -> 198, "Ccedil" -> 199,
    "Egrave" -> 200, "Eacute" -> 201, "Ecirc" -> 202, "Euml" -> 203,
    "Igrave" -> 204, "Iacute" -> 205, "Icirc" -> 206, "Iuml" -> 207,
    "ETH" -> 208, "Ntilde" -> 209, "Ograve" -> 210, "Oacute" -> 211,
    "Ocirc" -> 212, "Otilde" -> 213, "Ouml" -> 214, "times" -> 215,
    "Oslash" -> 216, "Ugrave" -> 217, "Uacute" -> 218, "Ucirc" -> 219,
    "Uuml" -> 220, "Yacute" -> 221, "THORN" -> 222, "szlig" -> 223,
    "agrave" -> 224, "aacute" -> 225, "acirc" -> 226, "atilde" -> 227,
    "auml" -> 228, "aring" -> 229, "aelig" -> 230, "ccedil" -> 231,
    "egrave" -> 232, "eacute" -> 233, "ecirc" -> 234, "euml" -> 235,
    "igrave" -> 236, "iacute" -> 237, "icirc" -> 238, "iuml" -> 239,
    "eth" -> 240, "ntilde" -> 241, "ograve" -> 242, "oacute" -> 243,
    "ocirc" -> 244, "otilde" -> 245, "ouml" -> 246, "divide" -> 247,
    "oslash" -> 248, "ugrave" -> 249, "uacute" -> 250, "ucirc" -> 251,
    "uuml" -> 252, "yacute" -> 253, "thorn" -> 254, "yuml" -> 255,
    // Latin Extended / punctuation / symbols
    "OElig" -> 338, "oelig" -> 339, "Scaron" -> 352, "scaron" -> 353,
    "Yuml" -> 376, "fnof" -> 402, "circ" -> 710, "tilde" -> 732,
    "ndash" -> 8211, "mdash" -> 8212, "lsquo" -> 8216, "rsquo" -> 8217,
    "sbquo" -> 8218, "ldquo" -> 8220, "rdquo" -> 8221, "bdquo" -> 8222,
    "dagger" -> 8224, "Dagger" -> 8225, "bull" -> 8226, "hellip" -> 8230,
    "permil" -> 8240, "lsaquo" -> 8249, "rsaquo" -> 8250, "euro" -> 8364,
    "trade" -> 8482)

  /** The decoded string for a named entity — ' ' for the
    * whitespace-class `nbsp`, the real codepoint otherwise. Shared
    * with the oracle generator so both engines derive from ONE table.
    */
  def namedEntityValue(cp: Int): String =
    if (cp == 160) " " else new String(Character.toChars(cp))

  /** Name-match pattern shared verbatim with the oracle: an entity
    * reference is `&` + a letter-led alphanumeric name + `;`. Java and
    * RE2 parse it identically.
    */
  val EntityNameRe: String = "^([A-Za-z][A-Za-z0-9]{0,31});"

  private val EntityMapCol: Column = map_from_arrays(
    lit(NamedEntityCodepoints.map(_._1).toArray),
    lit(NamedEntityCodepoints.map(p => namedEntityValue(p._2)).toArray))

  /** Named-entity decode as ONE split-on-`&` segment transform with a
    * literal-map probe — O(segments) with a hash lookup per segment,
    * instead of a |table|-deep replace chain per row (~125 names would
    * make the old fold both slow and codegen-hostile, and this runs
    * PER LINE inside [[mainContent]]'s lambda). Segment independence
    * gives the one-level decode rule for free: `&amp;lt;` splits to
    * segment `amp;lt;`, decodes its leading `amp` and re-emits `lt;`
    * verbatim — exactly the `&amp;`-last semantics of the old chain.
    * Runs AFTER [[decodeNumericRefs]] (whose `&#…` segments fail the
    * letter-led name match here and pass through). The no-`&` fast
    * path short-circuits the split entirely.
    */
  private def decodeNamedEntities(c: Column): Column = {
    val parts = split(c, "&")
    val decoded = transform(slice(parts, lit(2), size(parts) - 1), seg => {
      val nm = regexp_extract(seg, EntityNameRe, 1)
      val ch = element_at(EntityMapCol, nm)
      when(nm === "" || ch.isNull, concat(lit("&"), seg))
        .otherwise(concat(ch, seg.substr(length(nm) + 2, length(seg))))
    })
    when(!c.contains("&"), c)
      .otherwise(concat(element_at(parts, 1), array_join(decoded, "")))
  }

  private def decodeEntities(c: Column): Column =
    decodeNamedEntities(decodeNumericRefs(c))

  private def collapseWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** In-page robots directives (`<meta name="robots" content="…">`) —
    * the compliance signal crawl curation must honor ALONGSIDE
    * robots.txt: a page the server allowed fetching may still forbid
    * indexing. Both attribute orders are matched (name-first and
    * content-first, either quote style, any case); scope is the
    * quoted-attribute form — unquoted attribute values are out with
    * the rest of tag-soup recovery, documented not silent. Public
    * constants so the oracle interpolates the SAME patterns.
    */
  val MetaRobotsNameFirstRe: String =
    "(?is)<meta\\b[^>]*\\bname\\s*=\\s*[\"']robots[\"'][^>]*\\bcontent\\s*=\\s*[\"']([^\"']*)[\"']"
  val MetaRobotsContentFirstRe: String =
    "(?is)<meta\\b[^>]*\\bcontent\\s*=\\s*[\"']([^\"']*)[\"'][^>]*\\bname\\s*=\\s*[\"']robots[\"']"

  /** True when the page's robots meta carries `token` (or `none`,
    * which implies both noindex and nofollow) as a comma/space
    *-separated directive. Both extraction patterns run and their
    * captures concatenate — at most one matches a well-formed page,
    * and a no-match contributes the empty string, so the token scan
    * sees exactly the declared directives. Pure codegen (two
    * regexp_extract + one regexp_like).
    */
  private def metaRobotsDirective(html: Column, token: String): Column = {
    val declared = lower(concat(
      regexp_extract(html, MetaRobotsNameFirstRe, 1), lit(" "),
      regexp_extract(html, MetaRobotsContentFirstRe, 1)))
    regexp_like(declared, lit(s"(^|[\\s,])(?:$token|none)([\\s,]|$$)"))
  }

  def metaNoindex(html: Column): Column = metaRobotsDirective(html, "noindex")
  def metaNofollow(html: Column): Column = metaRobotsDirective(html, "nofollow")

  /** Drop pages whose robots meta forbids indexing — the in-page half
    * of compliance filtering (robots.txt is [[UrlOps.filterDisallowed]]).
    * A narrow map-only filter; no shuffle.
    */
  def filterNoindexed(df: org.apache.spark.sql.DataFrame,
                      htmlCol: String): org.apache.spark.sql.DataFrame =
    df.filter(!metaNoindex(col(htmlCol)))

  /** The `<link rel="canonical" href="…">` declaration, both attribute
    * orders, either quote style; null when absent or empty. Feeds
    * [[UrlOps.consolidateByCanonical]].
    */
  val CanonicalRelFirstRe: String =
    "(?is)<link\\b[^>]*\\brel\\s*=\\s*[\"']canonical[\"'][^>]*\\bhref\\s*=\\s*[\"']([^\"']*)[\"']"
  val CanonicalHrefFirstRe: String =
    "(?is)<link\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"']*)[\"'][^>]*\\brel\\s*=\\s*[\"']canonical[\"']"

  def canonicalLinkHref(html: Column): Column = {
    val a = regexp_extract(html, CanonicalRelFirstRe, 1)
    val b = regexp_extract(html, CanonicalHrefFirstRe, 1)
    when(a =!= "", a).when(b =!= "", b)
  }

  /** Soft-error / stop-page phrases: the server said 200 but the PAGE
    * says otherwise — soft 404s, parked domains, placeholder shells.
    * Status-code filtering ([[graft.sources.WarcIngest
    * .filterHtmlResponses]]) cannot catch these; every crawl corpus
    * (CCNet, RefinedWeb) drops them by content. Phrase list curated
    * and RE2-portable; public so the oracle interpolates the SAME
    * pattern.
    */
  val SoftErrorRe: String =
    "(?i)\\b(?:404 not found|page not found|error 404|access denied|" +
      "domain (?:is )?for sale|this domain may be for sale|" +
      "under construction|coming soon|account suspended)\\b"

  /** True when extracted main content marks a soft-error page: a
    * stop-phrase match, or content shorter than `minChars` (error
    * shells are near-empty after boilerplate removal). Pure codegen,
    * map-only.
    */
  def isSoftErrorPage(mainText: Column, minChars: Int = 20): Column =
    regexp_like(mainText, lit(SoftErrorRe)) || (length(mainText) < minChars)
}
