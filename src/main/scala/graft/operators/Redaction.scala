package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: regex-redact emails, phone
  * numbers and IPv4 addresses, keeping a per-document redaction count
  * for pipeline QA.
  *
  * Pure `regexp_extract_all` / `regexp_replace` column expressions —
  * codegen'd, narrow (no shuffle), and portable: every pattern is valid
  * and equivalent in both Java regex (Spark) and RE2 (DuckDB oracle);
  * no lookaround, no backreferences.
  *
  * Patterns apply in declaration order; counts are computed on the
  * original text per pattern, so an earlier redaction cannot consume a
  * later pattern's match (the built-ins' match classes are disjoint on
  * any input where a phone/IP is not embedded inside an email local
  * part).
  */
object Redaction {

  /** (name, pattern, replacement) redaction rules. */
  val DefaultRules: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("phone", """\b\d{3}[-. ]\d{3}[-. ]\d{4}\b""", "<PHONE>"),
    ("ipv4", """\b\d{1,3}(?:\.\d{1,3}){3}\b""", "<IP>")
  )

  /** Redacted text column (rules applied in order). */
  def redactText(text: Column,
                 rules: Seq[(String, String, String)] = DefaultRules): Column =
    rules.foldLeft(text) { case (c, (_, pat, repl)) => regexp_replace(c, pat, repl) }

  /** Total match count across rules, evaluated on the ORIGINAL text. */
  def piiCount(text: Column,
               rules: Seq[(String, String, String)] = DefaultRules): Column =
    rules.map { case (_, pat, _) => size(regexp_extract_all(text, lit(pat), lit(0))) }
      .reduce(_ + _).cast("long")

  /** Per-document redaction: doc_id, n_pii, redacted (the scrubbed text).
    * Downstream hashes/stores the scrubbed text; the count feeds
    * corpus-level PII-rate QA dashboards.
    */
  def redact(docs: DataFrame,
             rules: Seq[(String, String, String)] = DefaultRules): DataFrame =
    docs.select(col("doc_id"),
      piiCount(col("text"), rules).as("n_pii"),
      redactText(col("text"), rules).as("redacted"))
}
