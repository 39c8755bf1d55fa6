package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC-shaped binary ingest for the crawl-curation family — the
  * analogue of the reference's wire-format ingest
  * (`shared_code/json_converter.py:37-56` decodes Event Hub body bytes
  * to UTF-8 before any parse): the URL/HTML operators
  * ([[graft.operators.UrlOps]], [[graft.operators.TextExtraction]])
  * start from string columns, and this module is the stage that gets a
  * crawl there from parquet-staged binary WARC response records.
  *
  * Two entry points, matching how WARC material is actually staged:
  *
  *  - [[decodeRecords]] — a pre-parsed records frame (`url` string,
  *    `content` binary, `warc_date` timestamp): just the byte→string
  *    decode.
  *  - [[parseRawRecords]] — one binary blob per record holding the
  *    WARC header block + payload (`WARC/1.0\r\n` headers, blank line,
  *    body — ISO 28500 §4): header-field extraction and body split as
  *    pure column expressions (anchored multiline regexes — Java and
  *    RE2 agree on `(?m)`/`(?s)`), so the whole parse is map-only and
  *    oracle-replayable.
  *
  * Charset sniffing is out of scope (documented, like the reference's
  * UTF-8-only decode): payloads are decoded as UTF-8, and a crawl
  * whose charset survey matters runs detection upstream of staging.
  * HTTP response headers embedded in `response`-type payloads are the
  * caller's concern — pass `stripHttpHeaders = true` to drop everything
  * up to the payload's own first blank line.
  */
object WarcIngest {

  /** Decode a pre-parsed WARC records frame into the string-typed page
    * frame the curation capstone consumes: (`url`, `html`, `fetch_ts`).
    * Map-only, codegen'd.
    */
  def decodeRecords(records: DataFrame, urlCol: String = "url",
                    contentCol: String = "content",
                    dateCol: String = "warc_date"): DataFrame =
    records.select(col(urlCol).as("url"),
      decode(col(contentCol), "UTF-8").as("html"),
      col(dateCol).as("fetch_ts"))

  /** Parse raw WARC record blobs (header block + blank line + payload)
    * into (`url`, `html`, `fetch_ts`): `WARC-Target-URI` and
    * `WARC-Date` are pulled from the header block by anchored
    * multiline regex, the payload is everything after the FIRST blank
    * line (the ISO 28500 header/body separator — `\r\n\r\n`, with bare
    * `\n\n` tolerated). Records missing a target URI (warcinfo,
    * request records) come out with `url = ''` — filter them with
    * [[responsesOnly]]. `record_id` carries the `WARC-Record-ID`
    * (angle brackets stripped), the record's stable key.
    */
  def parseRawRecords(raw: DataFrame, rawCol: String = "record",
                      stripHttpHeaders: Boolean = false): DataFrame = {
    val s = decode(col(rawCol), "UTF-8")
    val body = regexp_extract(s, "(?s)\\r?\\n\\r?\\n(.*)$", 1)
    val html = if (stripHttpHeaders)
      regexp_extract(body, "(?s)\\r?\\n\\r?\\n(.*)$", 1) else body
    raw.select(
      regexp_extract(s, "(?m)^WARC-Target-URI:\\s*(\\S+)\\s*$", 1).as("url"),
      regexp_extract(s, "(?m)^WARC-Record-ID:\\s*<([^>]*)>\\s*$", 1)
        .as("record_id"),
      html.as("html"),
      to_timestamp(
        regexp_extract(s, "(?m)^WARC-Date:\\s*(\\S+)\\s*$", 1),
        "yyyy-MM-dd'T'HH:mm:ss'Z'").as("fetch_ts"))
  }

  /** Keep only rows that parsed to a usable page: a target URI and a
    * non-empty payload.
    */
  def responsesOnly(parsed: DataFrame): DataFrame =
    parsed.filter(col("url") =!= "" && col("html") =!= "")

  /** The inverse of [[parseRawRecords]] for tests and staging fixtures:
    * wrap (`url`, `html`, `fetch_ts`) as a raw WARC response record
    * blob. Kept in main (not test) code because a pipeline that stages
    * its own crawl snapshots needs the writer half too.
    */
  def wrapAsRawRecord(url: Column, html: Column, fetchTs: Column,
                      recordId: Column): Column =
    encode(concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: response\r\n"),
      lit("WARC-Record-ID: <"), recordId, lit(">\r\n"),
      lit("WARC-Target-URI: "), url, lit("\r\n"),
      lit("WARC-Date: "),
      date_format(fetchTs, "yyyy-MM-dd'T'HH:mm:ss'Z'"), lit("\r\n"),
      lit("Content-Length: "), length(html).cast("string"), lit("\r\n"),
      lit("\r\n"), html), "UTF-8")
}
