package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit, to_timestamp}
import org.scalatest.funsuite.AnyFunSuite

class WarcIngestSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("wrap -> parse round-trips url, record id, timestamp and payload byte-exactly") {
    import spark.implicits._
    // payload with single newlines (no blank line — the header/body
    // separator must win), entities, tags, non-ASCII UTF-8
    val html = "<html>\n<p>café &amp; 1 &lt; 2</p>\n<div>tail</div>"
    val raw = Seq(("https://example.com/p/1?a=1", "urn:graft:42", html))
      .toDF("url", "rid", "html")
      .select(WarcIngest.wrapAsRawRecord(col("url"), col("html"),
        to_timestamp(lit("2026-01-15 12:00:00")), col("rid")).as("record"))
    val parsed = WarcIngest.parseRawRecords(raw).collect()(0)
    assert(parsed.getAs[String]("url") == "https://example.com/p/1?a=1")
    assert(parsed.getAs[String]("record_id") == "urn:graft:42")
    assert(parsed.getAs[String]("html") == html)
    assert(parsed.getAs[java.sql.Timestamp]("fetch_ts").toInstant.toString
      == "2026-01-15T12:00:00Z")
  }

  test("responsesOnly drops records with no target URI or empty payload") {
    import spark.implicits._
    val good = Seq(("https://a.com/x", "urn:graft:1", "<p>body</p>"))
    val warcinfo = // a warcinfo record: no Target-URI header at all
      "WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Record-ID: <urn:graft:0>\r\n\r\nsoftware: test"
    val empty = // response with an empty payload
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:graft:9>\r\n" +
        "WARC-Target-URI: https://b.com/y\r\n\r\n"
    val raws = good.toDF("url", "rid", "html")
      .select(WarcIngest.wrapAsRawRecord(col("url"), col("html"),
        to_timestamp(lit("2026-01-15 12:00:00")), col("rid")).as("record"))
      .union(Seq(warcinfo, empty).toDF("s")
        .select(org.apache.spark.sql.functions.encode(col("s"), "UTF-8").as("record")))
    val kept = WarcIngest.responsesOnly(WarcIngest.parseRawRecords(raws))
      .select("record_id").as[String].collect().toSeq
    assert(kept == Seq("urn:graft:1"), s"kept: $kept")
  }

  test("stripHttpHeaders drops the embedded HTTP header block") {
    import spark.implicits._
    val payload = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>the page</p>"
    val raw = Seq(("https://a.com/x", "urn:graft:7", payload))
      .toDF("url", "rid", "html")
      .select(WarcIngest.wrapAsRawRecord(col("url"), col("html"),
        to_timestamp(lit("2026-01-15 12:00:00")), col("rid")).as("record"))
    val html = WarcIngest.parseRawRecords(raw, stripHttpHeaders = true)
      .select("html").as[String].collect()(0)
    assert(html == "<p>the page</p>")
  }

  test("decodeRecords: pre-parsed frames decode binary content as UTF-8") {
    import spark.implicits._
    val df = Seq(("https://a.com", "café <b>page</b>"))
      .toDF("url", "s")
      .select(col("url"),
        org.apache.spark.sql.functions.encode(col("s"), "UTF-8").as("content"),
        to_timestamp(lit("2026-01-15 12:00:00")).as("warc_date"))
    val out = WarcIngest.decodeRecords(df).collect()(0)
    assert(out.getAs[String]("html") == "café <b>page</b>")
    assert(out.getAs[String]("url") == "https://a.com")
  }

  private def sniff(bytes: Array[Byte]): (String, String) = {
    import spark.implicits._
    val r = Seq(Tuple1(bytes)).toDF("b").select(
      WarcIngest.sniffCharset(col("b")),
      WarcIngest.decodeSniffed(col("b"))).head()
    (r.getString(0), r.getString(1))
  }

  test("filterHtmlResponses: only 200 + HTML media types pass, header block stripped") {
    import spark.implicits._
    def pl(status: String, ct: String, body: String) =
      s"HTTP/1.1 $status OK\r\ncontent-type: $ct\r\n\r\n$body"
    val df = Seq(
      (1L, pl("200", "text/html; charset=utf-8", "<p>keep</p>")),
      (2L, pl("404", "text/html", "<p>not found page</p>")),
      (3L, pl("200", "application/pdf", "%PDF-1.4")),
      (4L, pl("200", "Application/XHTML+XML", "<p>xhtml</p>")),
      (5L, "no http header block at all")).toDF("doc_id", "payload")
    val kept = WarcIngest.filterHtmlResponses(df, "payload")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("content_type"), r.getAs[String]("html"))).toMap
    assert(kept == Map(
      1L -> (("text/html", "<p>keep</p>")),
      4L -> (("application/xhtml+xml", "<p>xhtml</p>"))), kept)
  }

  test("sniffCharset: BOM dispatch and BOM-stripped decode") {
    val utf8 = "café ñ".getBytes("UTF-8")
    assert(sniff(utf8) == (("utf-8", "café ñ")))
    assert(sniff(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ utf8) ==
      (("utf-8-bom", "café ñ")))
    assert(sniff(Array[Byte](0xFF.toByte, 0xFE.toByte) ++ "café".getBytes("UTF-16LE")) ==
      (("utf-16le", "café")))
    assert(sniff(Array[Byte](0xFE.toByte, 0xFF.toByte) ++ "café".getBytes("UTF-16BE")) ==
      (("utf-16be", "café")))
    assert(sniff("café ñ".getBytes("ISO-8859-1")) == (("iso-8859-1", "café ñ")))
  }

  test("sniffCharset: exact UTF-8 grammar — overlongs, surrogates, lone continuations all fall back") {
    // 4-byte supplementary char is VALID utf-8
    assert(sniff("ok 😀 emoji".getBytes("UTF-8"))._1 == "utf-8")
    // empty payload: trivially valid utf-8
    assert(sniff(Array.empty[Byte]) == (("utf-8", "")))
    // overlong encoding of '/' (C0 AF) is NOT valid utf-8
    assert(sniff("a".getBytes("UTF-8") ++ Array[Byte](0xC0.toByte, 0xAF.toByte))._1 == "iso-8859-1")
    // CESU-style surrogate bytes (ED A0 80) are NOT valid utf-8
    assert(sniff(Array[Byte](0xED.toByte, 0xA0.toByte, 0x80.toByte))._1 == "iso-8859-1")
    // a lone continuation byte is NOT valid utf-8
    assert(sniff(Array[Byte](0x80.toByte))._1 == "iso-8859-1")
    // truncated multi-byte sequence at end of payload
    assert(sniff("x".getBytes("UTF-8") ++ Array[Byte](0xE2.toByte, 0x80.toByte))._1 == "iso-8859-1")
    // F4 90 would be > U+10FFFF
    assert(sniff(Array[Byte](0xF4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte))._1 == "iso-8859-1")
  }

  test("declared charset tier: cp1252-family labels decode as windows-1252, with WHATWG latin-1 mapping") {
    // declared windows-1252 with \u00e9 (0xE9) plus the cp1252 high
    // bytes 0x80 (euro) and 0x92 (right single quote): the translate
    // tier must produce the cp1252 characters a latin-1 decode would
    // leave as C1 controls
    // NOTE the space after 0xE9: E9 80 92 alone happens to BE valid
    // UTF-8 (U+9012), which the validation tier would rightly claim —
    // declared-charset pages only reach their label when bytes are
    // genuinely not UTF-8
    val body = "<meta charset=\"windows-1252\">caf".getBytes("ISO-8859-1") ++
      Array[Byte](0xE9.toByte, 0x20.toByte, 0x80.toByte, 0x92.toByte)
    assert(sniff(body) == (("windows-1252",
      "<meta charset=\"windows-1252\">caf\u00e9 \u20ac\u2019")))
    // WHATWG: a DECLARED iso-8859-1 label decodes as cp1252 too
    val latinLabeled = "<meta charset=iso-8859-1>y".getBytes("ISO-8859-1") ++
      Array[Byte](0x85.toByte) // lone continuation byte: not UTF-8; = ellipsis in cp1252
    assert(sniff(latinLabeled) == (("windows-1252",
      "<meta charset=iso-8859-1>y\u2026")))
    // http-equiv / Content-Type form, single quotes, mixed-case label
    val httpEquiv = ("<meta http-equiv='Content-Type' content='text/html; " +
      "charset=CP1252'>x").getBytes("ISO-8859-1") ++
      Array[Byte](0x99.toByte) // 0x99 = trade mark sign
    assert(sniff(httpEquiv)._1 == "windows-1252")
    assert(sniff(httpEquiv)._2.endsWith("x\u2122"))
    // cp1252-UNDEFINED byte 0x81 stays a C1 control (evidence), not U+FFFD
    val undef = "<meta charset=windows-1252>a".getBytes("ISO-8859-1") ++
      Array[Byte](0x81.toByte)
    assert(sniff(undef)._2.endsWith("a\u0081"))
  }

  test("declared charset tier: valid bytes beat labels; unsupported labels fall back") {
    // VALID UTF-8 with a lying cp1252 label: bytes win
    val lying = "<meta charset=windows-1252>caf\u00e9".getBytes("UTF-8")
    assert(sniff(lying) == (("utf-8", "<meta charset=windows-1252>caf\u00e9")))
    // declared-but-unsupported koi8-r on non-UTF-8 bytes: latin-1
    // fallback (C1-preserving), label ignored
    val koi = "<meta charset=koi8-r>caf\u00e9".getBytes("ISO-8859-1")
    assert(sniff(koi) == (("iso-8859-1", "<meta charset=koi8-r>caf\u00e9")))
    // no declaration at all: the plain fallback path is unchanged
    assert(sniff("caf\u00e9".getBytes("ISO-8859-1")) == (("iso-8859-1", "caf\u00e9")))
  }

  test("declared CJK tier: shift_jis/euc-jp/gbk/big5 labels decode via the " +
      "allowlist; contradicting bytes drop to NULL; bytes still beat labels") {
    val jp = " \u65e5\u672c\u8a9e\u306e\u30c6\u30b9\u30c8\u7d42"     // JIS X 0208
    val zh = " \u4e2d\u6587\u6d4b\u8bd5\u7ed3\u675f"           // simplified (GB2312)
    val zhT = " \u4e2d\u6587\u6e2c\u8a66\u7d50\u675f"          // traditional (Big5 has no simplified forms)
    val cases = Seq(
      ("<meta charset=shift_jis>doc" + jp, "windows-31j", "shift_jis"),
      ("<meta charset=\"Shift-JIS\">doc" + jp, "windows-31j", "shift_jis"),
      ("<meta charset='euc-jp'>doc" + jp, "EUC-JP", "euc-jp"),
      ("<meta charset=gbk>doc" + zh, "GBK", "gbk"),
      ("<meta charset=GB2312>doc" + zh, "GBK", "gbk"),
      ("<meta charset=big5>doc" + zhT, "Big5", "big5"))
    cases.foreach { case (text, jvm, label) =>
      val bytes = text.getBytes(jvm)
      // the label assertion doubles as the validity-tier check: if the
      // CJK bytes were somehow valid UTF-8 the sniff would say 'utf-8'
      assert(sniff(bytes) == ((label, text)), s"case $label")
    }
    // a page DECLARING shift_jis whose bytes are not valid windows-31j
    // (0x85 is a lead byte with no trail): NULL text \u2014 countable
    // damage, never silently-wrong characters
    val contradicted = "<meta charset=shift_jis>x".getBytes("ISO-8859-1") ++
      Array[Byte](0x85.toByte)
    val r = sniff(contradicted)
    assert(r._1 == "shift_jis" && r._2 == null, r)
    // VALID UTF-8 with a CJK label: the validity tier still wins
    val lyingJp = ("<meta charset=shift_jis>utf8" + jp).getBytes("UTF-8")
    assert(sniff(lyingJp) == (("utf-8", "<meta charset=shift_jis>utf8" + jp)))
  }

  test("gzip member round trip: deflate -> inflate is identity on generated byte arrays") {
    import org.scalacheck.Gen
    import spark.implicits._
    // arbitrary binary (full byte range, incl. empty and gzip-magic-led
    // payloads), run in ONE bulk frame
    val byteGen = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    val payloads = (Gen.listOfN(200, byteGen).sample.get :+
      Array.empty[Byte]) :+ Array[Byte](0x1f, 0x8b.toByte)
    val got = payloads.zipWithIndex.map { case (b, i) => (i, b) }
      .toDF("i", "b")
      .select(col("i"),
        WarcIngest.inflateMember(WarcIngest.deflateMember(col("b"))).as("rt"))
      .orderBy("i").collect().map(_.getAs[Array[Byte]]("rt"))
    payloads.zip(got).zipWithIndex.foreach { case ((orig, rt), i) =>
      assert(java.util.Arrays.equals(orig, rt), s"round trip broke at $i")
    }
  }

  test("inflateMember: malformed/truncated members yield NULL (drop semantics), nulls propagate") {
    import spark.implicits._
    val junk = Seq(
      "not gzip at all".getBytes("UTF-8"),
      Array[Byte](0x1f, 0x8b.toByte, 8, 0), // magic + truncated header
      Array.empty[Byte])
    val got = junk.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "b")
      .select(WarcIngest.inflateMember(col("b")).as("r")).collect()
    assert(got.forall(_.isNullAt(0)), got.mkString(","))
  }

  test("inflateMember: a decompression bomb yields NULL instead of exhausting the heap") {
    import spark.implicits._
    // ~1 GiB of zeros compresses to ~1 MB; the cap must refuse it
    val bomb = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.util.zip.GZIPOutputStream(bos)
      val chunk = new Array[Byte](1 << 20)
      (0 until 1024).foreach(_ => out.write(chunk))
      out.close()
      bos.toByteArray
    }
    assert(bomb.length < 8 * 1024 * 1024, s"bomb should be small: ${bomb.length}")
    val got = Seq(Tuple1(bomb)).toDF("b")
      .select(WarcIngest.inflateMember(col("b")).as("r")).head()
    assert(got.isNullAt(0), "bomb must inflate to NULL, not a 1 GiB array")
  }

  test("parseGzRecords: record-gzipped member inflates and parses like the plain path") {
    import spark.implicits._
    val html = "<p>gz café &amp; body</p>"
    val raw = Seq(("https://example.com/gz/1", "urn:graft:7", html))
      .toDF("url", "rid", "html")
      .select(WarcIngest.deflateMember(WarcIngest.wrapAsRawRecord(
        col("url"), col("html"),
        to_timestamp(lit("2026-01-15 12:00:00")), col("rid"))).as("record"))
    val parsed = WarcIngest.parseGzRecords(raw).collect()(0)
    assert(parsed.getAs[String]("url") == "https://example.com/gz/1")
    assert(parsed.getAs[String]("record_id") == "urn:graft:7")
    assert(parsed.getAs[String]("html") == html)
    // and a malformed member flows to a dropped row, not a crash
    val bad = Seq(Tuple1("junk".getBytes("UTF-8"))).toDF("record")
    assert(WarcIngest.responsesOnly(WarcIngest.parseGzRecords(bad)).count() == 0)
  }

  test("wrapAsRawRecordTyped -> parse round-trips type and payload digest; " +
      "dedupByPayloadDigest keeps one response per digest, drops revisits") {
    import spark.implicits._
    val rows = Seq(
      // two responses sharing a declared digest: min record id survives
      ("urn:g:1", "https://a.com/1", "body one", "response", "md5:dup"),
      ("urn:g:2", "https://a.com/2", "body one again", "response", "md5:dup"),
      // a revisit pointing at the same digest: dropped regardless
      ("urn:g:3", "https://a.com/3", "", "revisit", "md5:dup"),
      // digest-less responses with IDENTICAL payloads: md5(html) keys them
      ("urn:g:4", "https://b.com/4", "same bytes", "response", ""),
      ("urn:g:5", "https://b.com/5", "same bytes", "response", ""),
      // digest-less response with unique payload: survives alone
      ("urn:g:6", "https://b.com/6", "unique bytes", "response", ""),
      // a request record: no payload tier at all
      ("urn:g:7", "https://c.com/7", "GET / HTTP/1.1", "request", ""))
      .toDF("rid", "url", "html", "wtype", "digest")
    val raw = rows.select(WarcIngest.wrapAsRawRecordTyped(col("url"),
      col("html"), to_timestamp(lit("2026-01-15 12:00:00")), col("rid"),
      col("wtype"), col("digest")).as("record"))
    val parsed = WarcIngest.parseRawRecords(raw)
    // round trip: type lowercased, digest '' when the header was omitted
    val byId = parsed.collect()
      .map(r => r.getAs[String]("record_id") ->
        ((r.getAs[String]("warc_type"), r.getAs[String]("payload_digest"))))
      .toMap
    assert(byId("urn:g:1") == (("response", "md5:dup")))
    assert(byId("urn:g:3") == (("revisit", "md5:dup")))
    assert(byId("urn:g:6") == (("response", "")))
    val kept = WarcIngest.dedupByPayloadDigest(parsed, "record_id")
      .collect().map(_.getAs[String]("record_id")).toSet
    assert(kept == Set("urn:g:1", "urn:g:4", "urn:g:6"), kept)
  }

  test("digest index: write/probe/append — novelByDigest passes only " +
      "responses with unseen effective digests; append closes the window") {
    import spark.implicits._
    def frame(rows: Seq[(String, String, String, String, String)]) =
      rows.toDF("record_id", "url", "warc_type", "payload_digest", "html")
    val seed = frame(Seq(
      ("urn:s:1", "https://a.com/1", "response", "md5:known", "x"),
      ("urn:s:2", "https://a.com/2", "response", "", "seen bytes"),
      // a revisit's digest must NOT seed the index (no payload stored)
      ("urn:s:3", "https://a.com/3", "revisit", "md5:ghost", "")))
    WarcIngest.writeDigestIndex(seed, "graft_test_digest_idx")
    try {
      val batch = frame(Seq(
        ("urn:b:1", "https://b.com/1", "response", "md5:known", "y"),   // blocked
        ("urn:b:2", "https://b.com/2", "response", "", "seen bytes"),   // blocked via md5(html)
        ("urn:b:3", "https://b.com/3", "response", "md5:ghost", ""),    // ghost never seeded -> passes
        ("urn:b:4", "https://b.com/4", "response", "", "new bytes"),    // novel
        ("urn:b:5", "https://b.com/5", "revisit", "", "new bytes")))    // non-response never passes
      val got = WarcIngest.novelByDigest(batch, "graft_test_digest_idx")
        .collect().map(_.getAs[String]("record_id")).toSet
      assert(got == Set("urn:b:3", "urn:b:4"), got)
      // fold the accepted batch in: a replayed identical batch now
      // yields nothing (the idempotence the streaming gate relies on)
      WarcIngest.appendToDigestIndex(batch, "graft_test_digest_idx")
      val again = WarcIngest.novelByDigest(batch, "graft_test_digest_idx")
        .count()
      assert(again == 0, s"after append the same batch must be fully seen, got $again")
    } finally spark.sql("DROP TABLE IF EXISTS graft_test_digest_idx")
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(bos)
    out.write(b); out.close()
    bos.toByteArray
  }

  test("splitGzMembers: n members in = n records out, byte-exact, order kept") {
    val members = (0 until 7).map(i =>
      s"WARC/1.0\r\nWARC-Target-URI: https://x.com/$i\r\n\r\nbody $i café"
        .getBytes("UTF-8"))
    val archive = members.map(gz).reduce(_ ++ _)
    val got = WarcIngest.splitGzMembersBytes(archive)
    assert(got.length == members.length)
    got.zip(members).foreach { case (g, m) =>
      assert(java.util.Arrays.equals(g, m)) }
    // and through the column face + explode, same count and content
    import spark.implicits._
    val rows = Seq(Tuple1(archive)).toDF("content")
      .select(org.apache.spark.sql.functions.explode(
        WarcIngest.splitGzMembers(col("content"))).as("record"))
    val parsed = WarcIngest.parseRawRecords(rows)
      .collect().map(_.getAs[String]("url")).sorted
    assert(parsed.toSeq == (0 until 7).map(i => s"https://x.com/$i"))
  }

  test("splitGzMembers: FNAME/FCOMMENT/FEXTRA/FHCRC headers walk correctly") {
    // hand-build one member with FEXTRA+FNAME+FCOMMENT+FHCRC set, then
    // a plain member after it — the walker must land exactly on it
    val payload = "second".getBytes("UTF-8")
    val plain = gz(payload)
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    val body = "first".getBytes("UTF-8")
    deflater.setInput(body); deflater.finish()
    val cbuf = new Array[Byte](256)
    val clen = deflater.deflate(cbuf)
    deflater.end()
    val crc = new java.util.zip.CRC32(); crc.update(body)
    val bos = new java.io.ByteArrayOutputStream()
    // header: magic, CM=8, FLG = FHCRC|FEXTRA|FNAME|FCOMMENT (0x1E)
    bos.write(Array[Byte](0x1F, 0x8B.toByte, 8, 0x1E, 0, 0, 0, 0, 0, 0))
    bos.write(Array[Byte](3, 0)); bos.write(Array[Byte](1, 2, 3)) // FEXTRA
    bos.write("name.warc".getBytes("ISO-8859-1")); bos.write(0)   // FNAME
    bos.write("a comment".getBytes("ISO-8859-1")); bos.write(0)   // FCOMMENT
    bos.write(Array[Byte](0, 0))                                   // FHCRC (unchecked)
    bos.write(cbuf, 0, clen)
    val trailer = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(crc.getValue.toInt).putInt(body.length).array()
    bos.write(trailer)
    val archive = bos.toByteArray ++ plain
    val got = WarcIngest.splitGzMembersBytes(archive)
    assert(got.length == 2, got.length)
    assert(new String(got(0), "UTF-8") == "first")
    assert(new String(got(1), "UTF-8") == "second")
  }

  test("splitGzMembers: a bomb member yields NULL in place; members after it survive") {
    val before = gz("before".getBytes("UTF-8"))
    val bomb = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.util.zip.GZIPOutputStream(bos)
      val chunk = new Array[Byte](1 << 20)
      (0 until 300).foreach(_ => out.write(chunk)) // 300 MiB > 256 MiB cap
      out.close()
      bos.toByteArray
    }
    val after = gz("after".getBytes("UTF-8"))
    val got = WarcIngest.splitGzMembersBytes(before ++ bomb ++ after)
    assert(got.length == 3)
    assert(new String(got(0), "UTF-8") == "before")
    assert(got(1) == null, "bomb member must be NULL, not buffered")
    assert(new String(got(2), "UTF-8") == "after",
      "draining the bomb must pin the boundary so later members survive")
  }

  test("splitGzMembers property: concat of n gzipped arbitrary payloads " +
      "splits back to exactly those n payloads, byte-exact") {
    import org.scalacheck.Gen
    val byteGen = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    val archiveGen = Gen.listOfN(40, Gen.listOf(byteGen).map(_.toVector))
      .sample.get
    // include adversarial member payloads: empty, and one that BEGINS
    // with the gzip magic (the walker must trust deflate lengths, not
    // magic scans)
    val cases = archiveGen :+
      Vector(Array.empty[Byte], Array[Byte](0x1f, 0x8b.toByte, 8, 0),
        "tail".getBytes("UTF-8"))
    cases.foreach { members =>
      val archive =
        members.map(gz).foldLeft(Array.empty[Byte])(_ ++ _)
      val got = WarcIngest.splitGzMembersBytes(archive)
      assert(got.length == members.length,
        s"${members.length} members in, ${got.length} out")
      got.zip(members).zipWithIndex.foreach { case ((g, m), i) =>
        assert(java.util.Arrays.equals(g, m), s"member $i diverged") }
    }
  }

  test("splitGzMembers: a corrupt member ends the walk with ONE countable NULL") {
    val ok = gz("ok".getBytes("UTF-8"))
    // corrupt: valid magic, then garbage deflate bytes
    val corrupt = Array[Byte](0x1F, 0x8B.toByte, 8, 0, 0, 0, 0, 0, 0, 0,
      0x55, 0x66, 0x77)
    val got = WarcIngest.splitGzMembersBytes(ok ++ corrupt)
    assert(got.length == 2)
    assert(new String(got(0), "UTF-8") == "ok")
    assert(got(1) == null)
    // trailing garbage that isn't even a header: same one-NULL rule
    val got2 = WarcIngest.splitGzMembersBytes(ok ++ Array[Byte](1, 2, 3))
    assert(got2.length == 2 && got2(1) == null)
    // empty file: zero members, zero nulls
    assert(WarcIngest.splitGzMembersBytes(Array.empty[Byte]).isEmpty)
  }

  test("resolveRevisits: digest join to the stored original; ghost digests " +
      "resolve to NULL; observedChangeRates NULLs single-fetch URLs") {
    import spark.implicits._
    val parsed = Seq(
      // url A: response v1, then a revisit of v1, then a response v2
      ("https://a.com/", "id:a1", "response", "md5:va1", "<p>1</p>"),
      ("https://a.com/", "id:a2", "revisit", "md5:va1", ""),
      ("https://a.com/", "id:a3", "response", "md5:va2", "<p>2</p>"),
      // url B: single fetch — no refetch evidence
      ("https://b.com/", "id:b1", "response", "md5:vb1", "<p>b</p>"),
      // url C: revisit whose digest matches no response (ghost), plus
      // a digest-less revisit that must drop (nothing to resolve by)
      ("https://c.com/", "id:c1", "response", "md5:vc1", "<p>c</p>"),
      ("https://c.com/", "id:c2", "revisit", "md5:ghost", ""),
      ("https://c.com/", "id:c3", "revisit", "", ""))
      .toDF("url", "record_id", "warc_type", "payload_digest", "html")
      .withColumn("fetch_ts",
        org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.lit("2026-01-10 00:00:00")))
    val resolved = WarcIngest.resolveRevisits(parsed)
      .collect().map(r => r.getString(1) ->
        ((Option(r.getString(4)), Option(r.getString(5))))).toMap
    assert(resolved.keySet == Set("id:a2", "id:c2"),
      s"digest-less revisits must drop: ${resolved.keySet}")
    assert(resolved("id:a2") == ((Some("id:a1"), Some("https://a.com/"))))
    assert(resolved("id:c2") == ((None, None)),
      "ghost digest must resolve to NULL originals, not drop")
    val rates = WarcIngest.observedChangeRates(parsed)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    // A: 3 fetches, versions {va1, va2} -> rate (2-1)/(3-1) = 0.5
    assert(rates("https://a.com") == ((3L, 2L, Some(0.5))), rates)
    // B: single fetch -> NULL rate (no refetch evidence)
    assert(rates("https://b.com") == ((1L, 1L, None)), rates)
    // C: 2 digest-bearing observations {vc1, ghost} -> rate 1.0 (the
    // digest-less revisit contributes nothing)
    assert(rates("https://c.com") == ((2L, 2L, Some(1.0))), rates)
  }

  test("splitGzMembers: trailer CRC32/ISIZE mismatches yield NULL in place " +
      "(members around survive); a truncated trailer is the corrupt tail") {
    val members = Seq("alpha", "beta", "gamma").map(_.getBytes("UTF-8"))
    val gzd = members.map(gz)
    // flip one bit inside member 1's CRC32 field (trailer = last 8
    // bytes: CRC32 LE then ISIZE LE) — deflate structure intact, so
    // the walk continues, but the member must come out NULL like the
    // single-member GZIPInputStream path would have thrown
    val badCrc = gzd(1).clone()
    badCrc(badCrc.length - 8) = (badCrc(badCrc.length - 8) ^ 0x01).toByte
    val got = WarcIngest.splitGzMembersBytes(gzd(0) ++ badCrc ++ gzd(2))
    assert(got.length == 3)
    assert(new String(got(0), "UTF-8") == "alpha")
    assert(got(1) == null, "CRC-mismatched member must be NULL")
    assert(new String(got(2), "UTF-8") == "gamma",
      "the boundary is known — members after a CRC mismatch survive")
    // ISIZE flip: same in-place NULL
    val badIsize = gzd(1).clone()
    badIsize(badIsize.length - 4) = (badIsize(badIsize.length - 4) ^ 0x01).toByte
    val got2 = WarcIngest.splitGzMembersBytes(gzd(0) ++ badIsize ++ gzd(2))
    assert(got2.length == 3 && got2(1) == null &&
      new String(got2(2), "UTF-8") == "gamma")
    // trailer truncated at EOF (4 of 8 bytes): the member is
    // unverifiable — corrupt-tail case, one countable trailing NULL
    val truncated = gzd(0) ++ gzd(1).dropRight(4)
    val got3 = WarcIngest.splitGzMembersBytes(truncated)
    assert(got3.length == 2)
    assert(new String(got3(0), "UTF-8") == "alpha")
    assert(got3(1) == null, "truncated-trailer member must not pass silently")
  }
}
