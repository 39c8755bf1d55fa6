package graft.operators

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class TextNormalizationSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(c: org.apache.spark.sql.Column, s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(c).head().getString(0)
  }

  test("nfc composes decomposed accents and is idempotent") {
    val composed = run(TextNormalization.nfc(col("t")), "Café naïve")
    assert(composed == "Café naïve", composed)
    assert(run(TextNormalization.nfc(col("t")), composed) == composed)
    assert(run(TextNormalization.nfc(col("t")), "plain ascii") == "plain ascii")
  }

  test("repairMojibake reverses the UTF-8-as-cp1252 bug on curated text") {
    val cp1252 = Charset.forName("windows-1252")
    def mangle(s: String): String =
      new String(s.getBytes(StandardCharsets.UTF_8), cp1252)
    val original = "déjà vu — “quoted” … café €5 naïve"
    val mangled = mangle(original)
    assert(mangled != original) // the bug actually fired
    assert(run(TextNormalization.repairMojibake(col("t")), mangled) == original)
    // clean text passes the lazy guard untouched
    assert(run(TextNormalization.repairMojibake(col("t")), "clean text") == "clean text")
  }

  test("repairMojibake round-trip property over the curated alphabet + ASCII") {
    val cp1252 = Charset.forName("windows-1252")
    val alphabet: Seq[Char] =
      TextNormalization.MojibakeChars.toSeq ++ "abc XYZ,.!?".toSeq
    val gen = Gen.listOf(Gen.oneOf(alphabet)).map(_.mkString)
    val prop = Prop.forAll(gen) { s =>
      val mangled = new String(s.getBytes(StandardCharsets.UTF_8), cp1252)
      run(TextNormalization.repairMojibake(col("t")), mangled) == s
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("stripControls removes C0/DEL/zero-width but keeps C1 (mojibake evidence) and TAB/LF/CR") {
    val got = run(TextNormalization.stripControls(col("t")),
      "\u0000a\u200Bb\u0007c\u007F d\u200D \te\nf\rg \u009Dh\uFEFF")
    assert(got == "abc d \te\nf\rg \u009Dh", got.map(_.toInt).mkString(","))
  }

  test("normalize chains strip -> repair -> NFC in an order that preserves repairability") {
    // the mojibake of a right double quote ends in C1 control U+009D;
    // stripping C1 first would make it unrepairable
    val dirty = "say \u00E2\u20AC\u009Dhi\u00E2\u20AC\u009D\u0007 Cafe\u0301\u200B"
    val got = run(TextNormalization.normalize(col("t")), dirty)
    assert(got == "say ”hi” Café", got)
  }
}
