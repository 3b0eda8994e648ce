package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction for a training-data pipeline, expressed as
  * pure Column expressions (whole-stage codegen, zero shuffle — per-row
  * regex work scales linearly and never moves data).
  *
  * The patterns use explicit ASCII classes only, so each regex means the
  * same thing in Spark (Java regex) and DuckDB (RE2) — that is what makes
  * the operator exactly SQL-oracle-checkable (no lookbehind, no backrefs,
  * both engines resolve these greedy classes identically).
  *
  * Redaction is STAGED — URLs first, then emails, then IPv4, then phones —
  * and each count is taken on the text as it stood at that stage. The
  * staging makes overlap semantics well-defined: an address in a URL's
  * userinfo is part of the URL (redacting it as an email first would
  * break the URL match and leave the path + query string — the classic
  * credential/token vector — unredacted); digits inside an
  * already-redacted URL can no longer masquerade as an IP or phone.
  */
object Pii {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** scheme matched case-insensitively via explicit classes (RE2 and Java
    * both honor them; inline (?i) flags differ between the engines).
    * '@' is in the class so userinfo URLs (https://user@host/...) match
    * whole — the URL stage runs first precisely so these are one URL.
    */
  val UrlPattern   = "[Hh][Tt][Tt][Pp][Ss]?://[A-Za-z0-9./_%?=&#:~@-]+"
  /** octet-bounded (0-255): version strings like 10.24.300.1 are NOT IPs */
  private val Octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  val Ipv4Pattern  = s"\\b$Octet\\.$Octet\\.$Octet\\.$Octet\\b"
  /** International-ish: leading +, then 8-20 total digits with space/()/-
    * separators. DELIBERATELY greedy across single spaces: a digit group
    * adjacent to a phone number ("+1 555 0100 2026") is absorbed into the
    * redaction — over-redacting number-adjacent digits is the
    * privacy-conservative failure mode, and RE2 has no lookahead with
    * which to express a tighter boundary portably.
    */
  val PhonePattern = "\\+[0-9][0-9 ()-]{6,18}[0-9]"

  val EmailToken = "<EMAIL>"
  val UrlToken   = "<URL>"
  val IpToken    = "<IP>"
  val PhoneToken = "<PHONE>"

  private def count(c: Column, pat: String): Column =
    size(regexp_extract_all(c, lit(pat), lit(0))).cast("long")

  /** The ONE definition of stage order: (pattern, token) in redaction
    * sequence. Both redacted() and piiScrub() derive from this list so
    * the overlap semantics cannot drift between them.
    */
  val Stages: Seq[(String, String, String)] = Seq(
    ("n_urls", UrlPattern, UrlToken),
    ("n_emails", EmailPattern, EmailToken),
    ("n_ips", Ipv4Pattern, IpToken),
    ("n_phones", PhonePattern, PhoneToken))

  /** Text as it stands entering each stage: head = original, last = fully
    * redacted.
    */
  private def stagedTexts(t0: Column): Seq[Column] =
    Stages.scanLeft(t0) { case (t, (_, pat, tok)) =>
      regexp_replace(t, pat, tok)
    }

  /** The fully staged redaction of a text column. */
  def redacted(text: Column): Column = stagedTexts(text).last

  /** Pipeline form: `text` replaced in place by its redaction, every
    * other column untouched (what CorpusPrep's pii_redact stage applies).
    */
  def redactText(df: DataFrame): DataFrame =
    df.withColumn("text", redacted(col("text")))

  /** (doc_id, n_urls, n_emails, n_ips, n_phones, clean_text): staged
    * counts + fully redacted text, from a `text` column. Each count is
    * taken on the text as already redacted by the PRIOR stages.
    */
  def piiScrub(df: DataFrame): DataFrame = {
    val texts = stagedTexts(col("text"))
    Partitioning.spreadSmall(df.select(col("doc_id"), col("text"))).select(
      (col("doc_id") +:
        Stages.zip(texts.init).map { case ((name, pat, _), t) =>
          count(t, pat).as(name)
        }) :+ texts.last.as("clean_text"): _*)
  }
}
