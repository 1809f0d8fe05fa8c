package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: replace emails, phone numbers,
  * and IPv4 addresses with typed placeholder tokens, and count what was
  * redacted (the counts feed the pipeline's compliance report).
  *
  * Patterns are restricted to the regex subset with IDENTICAL semantics
  * in java.util.regex (Spark executors) and RE2 (the DuckDB oracle):
  * character classes, bounded repetition, `\b`, `\d` — no backrefs, no
  * lookaround. Per-row regex work, embarrassingly parallel, inside
  * whole-stage codegen (regexp_replace / regexp_extract_all are native
  * Catalyst expressions). */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private def countOf(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Adds `scrubbed` (text with `<EMAIL>`/`<PHONE>`/`<IP>` in place of
    * matches; email first — an address would otherwise leave its
    * host's dotted part for the IP rule) and per-kind counts from the
    * ORIGINAL text. */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", countOf(t, EmailRe))
      .withColumn("n_phones", countOf(t, PhoneRe))
      .withColumn("n_ips", countOf(t, IpRe))
      .withColumn("scrubbed",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            IpRe, "<IP>"),
          PhoneRe, "<PHONE>"))
  }
}
