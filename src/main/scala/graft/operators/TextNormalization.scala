package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unicode-level text repair — the cleaning pass every large corpus
  * pipeline runs before tokenization (C4/CCNet normalize to NFC;
  * Dolma/ftfy repair mojibake; everything strips control and
  * zero-width characters, which tokenizers otherwise turn into junk
  * tokens). The reference engine ingests device telemetry and never
  * needed this; a 100 TB crawl corpus is FULL of it.
  *
  * Everything is a narrow map (no shuffle): [[stripControls]] is one
  * codegen'd `regexp_replace`, [[repairMojibake]] a codegen'd
  * `replace` chain behind a lazy contains guard, and [[nfc]] one
  * compiled kernel (`java.text.Normalizer` — no Catalyst built-in
  * exists; a `ScalaUDF` codegens as a plain invoke so the surrounding
  * projection stays fused, the same measured trade as
  * [[UrlOps]]'s percent-escape kernel). The DuckDB oracle replays
  * [[stripControls]] and [[repairMojibake]] term for term and pins
  * [[nfc]] against DuckDB's independent `nfc_normalize`
  * implementation — a cross-engine check, not a replay.
  */
object TextNormalization {

  /** Characters stripped outright: C0 controls except TAB/LF/CR
    * (those are whitespace, later passes own them), DEL, the
    * zero-width set (ZWSP/ZWNJ/ZWJ U+200B–U+200D) and the BOM/ZWNBSP
    * U+FEFF. C1 controls (U+0080–U+009F) are deliberately KEPT: they
    * are mojibake evidence ([[repairMojibake]] matches sequences
    * containing them — cp1252's five undefined bytes decode there),
    * so stripping them first would destroy repairable text. `\x{...}`
    * syntax parses identically in Java regex and RE2, so one constant
    * serves both engines.
    */
  val ControlCharClass: String =
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x{200B}-\\x{200D}\\x{FEFF}]"

  def stripControls(c: Column): Column =
    regexp_replace(c, ControlCharClass, "")

  /** The curated repair alphabet: characters whose UTF-8 bytes, when
    * misdecoded as windows-1252 (the classic double-encoding bug),
    * produce the textbook `Ã©`/`â€™` garbage. Three-byte characters
    * (general punctuation, €, ™) come FIRST: their mojibake starts
    * with `â` and must not be partially consumed by a two-byte rule.
    * The set is curated rather than exhaustive by design — a fixed
    * replace table is deterministic, engine-portable and auditable;
    * full ftfy-style inference needs byte-level re-decoding that no
    * SQL oracle can replay. False positives (text that legitimately
    * says `Ã©` meaning Ã+©) are inherent to ANY mojibake repair and
    * vanishingly rare in natural text.
    */
  val MojibakeChars: String =
    "‘’“”–—…•€™‹›" +
      "éèêëàâäçîïôöùûüÿñáíóúÉÈÊÀÂÇÑÖÜ°«»±µ·¿¡"

  /** The cp1252 high half (0x80–0x9F), written out rather than taken
    * from `Charset.forName("windows-1252")` because decoders disagree
    * exactly where mojibake is born: the five UNDEFINED bytes
    * (0x81 0x8D 0x8F 0x90 0x9D) come out as the corresponding C1
    * controls from latin-1-family decoders (the lossless convention —
    * what most real mojibake contains) but as U+FFFD from Java's
    * cp1252 decoder. The table pins the C1 convention; [[MojibakePairs]]
    * additionally emits the U+FFFD variant for any form that contains
    * one of those bytes. 0xA0–0xFF and ASCII decode as latin-1
    * (identity).
    */
  private val Cp1252High: Map[Int, Char] = Map(
    0x80 -> '€', 0x81 -> '\u0081', 0x82 -> '‚', 0x83 -> 'ƒ',
    0x84 -> '„', 0x85 -> '…', 0x86 -> '†', 0x87 -> '‡',
    0x88 -> 'ˆ', 0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹',
    0x8C -> 'Œ', 0x8D -> '\u008D', 0x8E -> 'Ž', 0x8F -> '\u008F',
    0x90 -> '\u0090', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
    0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
    0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
    0x9C -> 'œ', 0x9D -> '\u009D', 0x9E -> 'ž', 0x9F -> 'Ÿ')

  /** The 27 DEFINED high-half mappings as (latin-1 C1 char → cp1252
    * char) pairs, derived from [[Cp1252High]] (the five undefined
    * slots map to themselves there and are filtered out). This is the
    * translate table a WHATWG-style windows-1252 decode applies ON TOP
    * of a latin-1 decode ([[graft.sources.WarcIngest]]'s declared-
    * charset tier): latin-1 and cp1252 agree everywhere except
    * 0x80–0x9F, so decode-then-translate is exactly the cp1252 decode
    * for defined bytes, while the five undefined bytes stay C1
    * controls — the repo's lossless evidence convention — instead of
    * Java's U+FFFD.
    */
  val Cp1252DefinedPairs: Seq[(Char, Char)] = (0x80 to 0x9F)
    .filter(u => Cp1252High(u) != u.toChar)
    .map(u => (u.toChar, Cp1252High(u)))

  /** What `s` looks like after the UTF-8-as-cp1252 misdecode, C1
    * convention. Public for tests and the oracle generator.
    */
  def mojibakeOf(s: String): String =
    s.getBytes(StandardCharsets.UTF_8).map { b =>
      val u = b & 0xFF
      if (u >= 0x80 && u <= 0x9F) Cp1252High(u) else u.toChar
    }.mkString

  /** (mojibake form, repaired char) pairs, derived — not hand-typed —
    * by running the actual bug in reverse via [[mojibakeOf]]. Forms
    * whose bytes hit a cp1252-undefined slot get a SECOND pair with
    * U+FFFD in that position (Java/Python replacement-decoder output);
    * within the curated alphabet the FFFD forms stay unambiguous
    * (only `”` produces one).
    */
  val MojibakePairs: Seq[(String, String)] = {
    def isC1(c: Char) = c >= '\u0080' && c <= '\u009F'
    MojibakeChars.flatMap { ch =>
      val c = ch.toString
      val bad = mojibakeOf(c)
      val forms =
        if (bad.exists(isC1))
          Seq(bad, bad.map(x => if (isC1(x)) '\uFFFD' else x))
        else Seq(bad)
      forms.map(_ -> c)
    }
  }

  /** Repair UTF-8-as-cp1252 double-encoding for the curated alphabet.
    * A codegen'd `replace` fold; the leading CaseWhen guard
    * short-circuits rows containing none of the three mojibake lead
    * characters (`Ã` `Â` `â` — every curated sequence starts with
    * one), so clean text — the overwhelming majority at corpus
    * scale — pays three `contains` scans, not |alphabet| replaces.
    */
  def repairMojibake(c: Column): Column = {
    val chain = MojibakePairs.foldLeft(c) { case (acc, (bad, good)) =>
      replace(acc, lit(bad), lit(good))
    }
    when(!c.contains("Ã") && !c.contains("Â") && !c.contains("â"), c)
      .otherwise(chain)
  }

  /** Unicode NFC normalization (canonical composition): decomposed
    * `e` + U+0301 becomes `é`, so equal-looking strings hash equal in
    * every downstream dedup/shingle/token operator. One compiled
    * kernel over `java.text.Normalizer`; the fast path (already-NFC,
    * checked by `Normalizer.isNormalized` — true for all-ASCII) costs
    * one scan and zero allocation.
    */
  def nfc(c: Column): Column = nfcKernel(c)

  private val nfcKernel = udf { (s: String) =>
    if (s == null) null
    else if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  /** The full cleaning pass in canonical order: strip disposable
    * control/zero-width characters (C1 kept — mojibake evidence),
    * repair double-encoding, then compose to NFC. NFC runs LAST so it
    * sees the repaired characters; running it first would compose
    * around mojibake bytes and change nothing useful.
    */
  def normalize(c: Column): Column =
    nfc(repairMojibake(stripControls(c)))
}
