package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: count and
  * mask emails, IPv4 addresses and NANP-style phone numbers before a
  * corpus is released or trained on.
  *
  * Pure Column expressions (regexp_count / chained regexp_replace) —
  * codegen'd, per-row, no shuffle. The patterns avoid constructs that
  * differ between Java regex and RE2 (no backreferences, no lookaround)
  * so an external SQL oracle applies the identical automaton.
  */
object PiiFunctions {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-ish: optional parenthesised area code, then 3+4 digits with
    * -, . or space separators. No leading \b: '(' is a non-word char so
    * a boundary assertion there would never hold. */
  val PhoneRe = "\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}\\b"

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe))
  def ipv4Count(c: Column): Column = regexp_count(c, lit(Ipv4Re))
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhoneRe))

  /** Mask all three PII classes. Email first (its local part may
    * contain digits a later pattern would chew on), then IP, then
    * phone. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
}
