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
  * Patterns apply in declaration order; each rule's matches are counted
  * on the text AFTER the earlier rules' redactions (the same text the
  * rule actually rewrites), so `n_pii` equals the number of replacements
  * performed — a phone-shaped string inside an email local part is
  * consumed by the email rule and counted once, not twice.
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

  /** Total replacement count: each rule's matches counted on the text as
    * already redacted by the rules before it — exactly what
    * [[redactText]] replaces. The per-stage `regexp_replace` chain is
    * shared with the redacted-text column by Catalyst's common
    * subexpression elimination within the projection.
    */
  def piiCount(text: Column,
               rules: Seq[(String, String, String)] = DefaultRules): Column =
    rules.foldLeft((text, lit(0L))) { case ((t, acc), (_, pat, repl)) =>
      (regexp_replace(t, pat, repl),
        acc + size(regexp_extract_all(t, lit(pat), lit(0))).cast("long"))
    }._2

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
