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
  * numeric character references beyond `&#39;`, and DOM-aware
  * block scoring (jusText's context-sensitive pass). [[mainContent]] is
  * the line-structured heuristic tier: it assumes the page puts block
  * elements on their own lines (true of the planted corpus and of most
  * template output); [[stripHtml]] makes no such assumption.
  */
object TextExtraction {

  /** Whole-document text extraction: drop `<script>`/`<style>` elements
    * WITH their contents and HTML comments (all possibly multi-line),
    * strip every remaining tag, decode the predefined entities
    * (`&lt; &gt; &quot; &#39; &nbsp;`, and `&amp;` LAST so
    * double-encoded text decodes one level, the standard rule), then
    * collapse whitespace runs to single spaces.
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
    * `\n`. Script/style/comment spans are handled per line (the
    * line-structured assumption above).
    */
  def mainContent(html: Column, minChars: Int = 25,
                  maxLinkWordRatio: Double = 0.34): Column = {
    // extract each line ONCE (Catalyst does not CSE across separate
    // higher-order-function lambdas — filtering on lineText and then
    // re-deriving it in transform would run the whole regex chain twice
    // per kept line, and this is the hot operator of the crawl path):
    // transform to (anchors, text), filter on the pair, project text
    val extracted = transform(split(html, "\n"),
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

  private def decodeEntities(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&") // &amp; LAST
    steps.foldLeft(c) { case (acc, (ent, ch)) => replace(acc, lit(ent), lit(ch)) }
  }

  private def collapseWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))
}
