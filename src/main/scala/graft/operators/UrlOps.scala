package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level corpus operators — the FIRST stage of every web-scale
  * training pipeline (C4, RefinedWeb, CCNet, Dolma all dedupe crawl
  * records by canonical URL and drop blocklisted domains before any
  * text ever gets tokenized; the reference ingests device topics, but a
  * corpus engine at 100 TB starts from crawl WARCs keyed by URL).
  *
  * Everything here is composed from codegen'd Catalyst built-ins
  * (regexp/split/filter/array_sort/concat) — no UDFs — so the
  * canonicalization runs inside WholeStageCodegen as a pure map and a
  * DuckDB oracle can replay it term for term:
  *
  *  - strip the fragment (`#...`)
  *  - lowercase scheme and authority (path/query stay case-sensitive)
  *  - strip the scheme-default port (`:80` for http, `:443` for https)
  *  - strip a leading `www.` label
  *  - strip trailing `/` from the path
  *  - drop tracking query params (`utm_*`, `fbclid`, `gclid`, `ref`),
  *    sort the survivors byte-lexicographically, drop an emptied `?`
  *
  * Deliberately out of scope (documented, not silently wrong):
  * percent-encoding normalization, IDN/punycode, userinfo, IPv6
  * literals, public-suffix-list awareness (`domainChain` is purely
  * label-structural). Inputs are expected to be absolute http(s) URLs;
  * a scheme-less string flows through the same formula unchanged
  * (canonical form starts with `://`), identically on both engines.
  */
object UrlOps {

  /** Query params dropped before canonical comparison. Non-capturing
    * groups only — the pattern must mean the same thing to Java regex
    * (Spark) and RE2 (DuckDB).
    */
  private[operators] val TrackingParamRe = "^(?:utm_[^=]*|fbclid|gclid|ref)(?:=|$)"
  private[operators] val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Canonical form of an absolute URL, per the rules above. Pure
    * column expression — map-only, shuffle-free, codegen'd.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, SchemeRe, 1))
    val rest = regexp_replace(noFrag, SchemeRe, "")
    val host = hostOf(scheme, rest)
    val path = regexp_replace(
      regexp_extract(rest, "^[^/?]*([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe)))
    val qs = array_join(params, "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** Canonical host of an absolute URL: lowercased authority, default
    * port stripped, leading `www.` stripped.
    */
  def canonicalHost(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, SchemeRe, 1))
    hostOf(scheme, regexp_replace(noFrag, SchemeRe, ""))
  }

  private def hostOf(scheme: Column, rest: Column): Column = {
    val authority = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val noPort = when(scheme === "http", regexp_replace(authority, ":80$", ""))
      .when(scheme === "https", regexp_replace(authority, ":443$", ""))
      .otherwise(authority)
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Canonical path of an absolute URL: everything between the
    * authority and the query/fragment, trailing slashes stripped —
    * the same path term [[canonicalizeUrl]] assembles.
    */
  def canonicalPath(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val rest = regexp_replace(noFrag, SchemeRe, "")
    regexp_replace(regexp_extract(rest, "^[^/?]*([^?]*)", 1), "/+$", "")
  }

  /** Drop rows whose canonical (host, path) matches a robots disallow
    * rule — `robots` carries one (`host`, `prefix`) row per
    * `Disallow:` line, keyed by EXACT host (robots.txt is per-host,
    * unlike the suffix-matched blocklist), with PATH-PREFIX semantics:
    * disallowing `/admin` blocks `/admin` and `/admin/x` (and
    * `/administrator` — the raw prefix rule, as crawlers apply it;
    * `*` wildcards and `Allow:` overrides are out of scope,
    * documented). Hosts with no rules pass.
    *
    * Shape mirrors [[filterBlockedDomains]]: the rules table rides a
    * broadcast into an equi-join on host (prefix check as the join
    * residual), blocked keys anti-join back — AQE-guarded, the corpus
    * frame is never forced through the driver.
    */
  def filterDisallowed(df: DataFrame, urlCol: String, keyCol: String,
                       robots: DataFrame): DataFrame = {
    val withHp = df.select(col(keyCol),
      canonicalHost(col(urlCol)).as("_h"), canonicalPath(col(urlCol)).as("_p"))
    // an EMPTY Disallow means "allow all" in robots.txt — but
    // startsWith("") is true for every path, so an empty-prefix rule
    // must be dropped here, not allowed to block the whole host
    val rules = robots.select(col("host").as("_h"), col("prefix"))
      .filter(col("prefix").isNotNull && col("prefix") =!= "")
    val blockedKeys = withHp
      .join(broadcast(rules), Seq("_h"), "inner")
      .filter(col("_p").startsWith(col("prefix")))
      .select(keyCol).distinct()
    df.join(blockedKeys, Seq(keyCol), "left_anti")
  }

  /** Every ≥2-label suffix of a host, most-specific first:
    * `a.b.example.com` → `[a.b.example.com, b.example.com, example.com]`.
    * A single-label host yields itself. This is the join key set for
    * blocklist matching — matching N blocklist entries costs a hash
    * probe per chain element (≤ label depth, ~5), not a scan of the
    * blocklist.
    */
  def domainChain(host: Column): Column = {
    // a non-default port survives canonicalHost ("example.com:8080") —
    // chain on the port-free host or the blocklist never matches it
    val bare = regexp_replace(host, ":\\d+$", "")
    val parts = split(bare, "\\.")
    val n = size(parts)
    when(n >= 2,
      transform(sequence(lit(0), n - lit(2)),
        i => array_join(slice(parts, i + lit(1), n - i), ".")))
      .otherwise(array(bare))
  }

  /** Keep exactly one row per canonical URL — the smallest `keyCol`
    * (first-crawled wins under monotone ids). Appends a `canon_url`
    * column.
    *
    * Shape: one hash shuffle on the canonical URL with MAP-SIDE partial
    * aggregation (`min` over a key-first struct), not a
    * partition-sorting window — at 100 TB the combiner collapses
    * duplicates before the exchange, and URL-keyed groups are
    * skew-free by construction (a group is one page's re-crawls).
    */
  def dedupByCanonicalUrl(df: DataFrame, urlCol: String,
                          keyCol: String): DataFrame = {
    require(!df.columns.contains("canon_url"),
      "dedupByCanonicalUrl appends a canon_url column — the input already " +
        "has one (drop or rename it; silently overwriting would make the " +
        "output ambiguous)")
    val others = df.columns.filterNot(_ == keyCol).map(col).toSeq
    df.withColumn("canon_url", canonicalizeUrl(col(urlCol)))
      .groupBy(col("canon_url"))
      .agg(min(struct(col(keyCol) +: others: _*)).as("_kept"))
      .select((df.columns.map(c => col(s"_kept.$c")) :+ col("canon_url")).toSeq: _*)
  }

  /** Drop rows whose canonical host — or ANY parent domain of it — is
    * in `blocklist` (one `domain` column). Suffix semantics: blocking
    * `example.com` blocks `ads.example.com`; blocking
    * `media.example.com` does not block `example.com`.
    *
    * Shape: explode the (≤ label-depth) domain chain, broadcast-semi
    * against the blocklist to collect blocked keys, then anti-join the
    * original frame on `keyCol`. Only the BLOCKLIST side carries a
    * broadcast hint — blockedKeys is corpus-bounded, not
    * blocklist-bounded (block one blogspot-scale domain and it holds
    * every key under it), so forcing it through the driver would be
    * the 8-GB-broadcast/driver-OOM failure mode at 100 TB. AQE's
    * runtime size check upgrades the anti to a broadcast join in the
    * common small-blast-radius case and falls back to a shuffle join
    * when blocking actually matched at scale.
    */
  def filterBlockedDomains(df: DataFrame, hostCol: String, keyCol: String,
                           blocklist: DataFrame): DataFrame = {
    val blockedKeys = df
      .select(col(keyCol), explode(domainChain(col(hostCol))).as("_d"))
      .join(broadcast(blocklist.select(col("domain").as("_d"))),
        Seq("_d"), "left_semi")
      .select(keyCol).distinct()
    df.join(blockedKeys, Seq(keyCol), "left_anti")
  }

  // ---- persisted URL-frontier index (the crawl seen-set) ----
  // The fifth external-index family next to MinHash buckets, SimHash
  // band segments, IVF lists and line claims: the "sketch" is the
  // canonical URL itself, so probes are exact with no verify step.
  // Bucketed on canon_url so a batch probe shuffles only the batch side.

  /** Persist the distinct canonical URLs of `df` as a bucketed claims
    * table — the crawl frontier's seen-set.
    */
  def writeUrlIndex(df: DataFrame, urlCol: String, tableName: String,
                    buckets: Int = 64): Unit = {
    Dedup.dropManaged(df.sparkSession, tableName)
    df.select(canonicalizeUrl(col(urlCol)).as("canon_url")).distinct()
      .write.format("parquet")
      .bucketBy(buckets, "canon_url").sortBy("canon_url")
      .mode("overwrite").saveAsTable(tableName)
    df.sparkSession.sql(
      s"ALTER TABLE $tableName SET TBLPROPERTIES('graft.buckets' = '$buckets')")
  }

  /** Append newly-claimed canonical URLs (one `canon_url` column) to a
    * [[writeUrlIndex]] table; bucketing re-validated from the catalog so
    * the co-partitioned probe stays lossless across appends.
    */
  def appendToUrlIndex(newUrls: DataFrame, tableName: String): Unit = {
    val spark = newUrls.sparkSession
    val buckets = spark.sql(s"SHOW TBLPROPERTIES $tableName").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
      .getOrElse("graft.buckets", throw new IllegalArgumentException(
        s"url index $tableName carries no graft.buckets property — " +
          "not written by writeUrlIndex")).toInt
    newUrls.select("canon_url").distinct()
      .write.format("parquet")
      .bucketBy(buckets, "canon_url").sortBy("canon_url")
      .mode("append").saveAsTable(tableName)
  }

  /** Rows of `df` whose canonical URL is NOT yet claimed by the index —
    * the frontier filter a crawl scheduler runs on every candidate
    * batch. Appends a `canon_url` column. Claims come ONLY from the
    * index (two in-batch rows with the same novel canonical both pass),
    * so the result is identical under any micro-batch partitioning of
    * the same input — the property the streaming gate's oracle needs;
    * append the accepted batch via [[appendToUrlIndex]] when in-stream
    * self-dedup matters. Per-batch cost: one co-partitioned anti-join
    * against the bucketed claims table, independent of frontier size.
    */
  def stripSeenUrls(df: DataFrame, urlCol: String, tableName: String): DataFrame = {
    require(!df.columns.contains("canon_url"),
      "stripSeenUrls appends a canon_url column — the input already has " +
        "one (drop or rename it; a stale canonical from an older rule set " +
        "would silently bypass the frontier)")
    df.withColumn("canon_url", canonicalizeUrl(col(urlCol)))
      .join(df.sparkSession.table(tableName), Seq("canon_url"), "left_anti")
  }
}
