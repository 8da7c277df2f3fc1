package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for LLM training corpora (north-star extension):
  * detect and mask emails, phone numbers, and IPv4 addresses before
  * text reaches a training set — the standard pre-training redaction
  * pass (e.g. the C4/Dolma pipelines).
  *
  * All pure `Column` expressions over Spark's codegen'd regexp
  * machinery — map-only at any scale, no shuffle, no UDF. The patterns
  * deliberately use only syntax shared by Java regex and RE2 (character
  * classes, bounded repetition, `\b`, non-capturing groups) so the
  * DuckDB oracle can run the exact same patterns.
  */
object PiiRedaction {

  /** user@host.tld — local part and domain per the common permissive
    * form; requires a 2+ letter TLD. */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-ish 555-0123 / 415-555-0123 forms: optional 3-digit prefix,
    * then XXX-XXXX, word-bounded so order ids like 123456-7890 don't
    * half-match. */
  val PhonePattern: String =
    "\\b(?:[0-9]{3}-)?[0-9]{3}-[0-9]{4}\\b"

  /** Dotted-quad IPv4 (no octet-range validation — redaction favors
    * recall over precision). */
  val Ipv4Pattern: String =
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))

  /** Mask all three PII classes. Email first: an email's domain can
    * contain a dotted-quad (user@10.0.0.1 is rare but legal) and the
    * email mask must win; phones before IPs for the same
    * longest-entity-first reason. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")
}
