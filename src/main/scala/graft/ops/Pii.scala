package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — the pre-release
  * scrubbing pass every public training corpus runs (the C4/Dolma
  * recipe: regex-class detectors for emails, phone numbers, IP
  * addresses, and long account-number-like digit runs, replaced by
  * stable placeholder tokens so downstream tokenization sees a
  * consistent vocabulary item rather than a hole).
  *
  * Execution shape: pure `regexp_replace` / `regexp_count` column
  * expressions — map-only, codegen-resident, zero shuffles; the scan
  * cost IS the cost, at any corpus size. No UDFs, no dictionaries, no
  * state.
  *
  * Pattern dialect discipline: every pattern stays inside the
  * Java-regex ∩ RE2 common subset (character classes, counted
  * repetition, alternation, ASCII `\b` word boundaries — no lookaround,
  * no backreferences), and alternations are ordered so leftmost-FIRST
  * matching (both engines' semantics) picks the intended branch — which
  * is what makes the operator's output mirrorable in a second engine
  * for the correctness gate (`q_pii_redact`).
  *
  * Redaction order is fixed and load-bearing: emails first (their local
  * parts may contain digit runs that would otherwise half-match later
  * detectors), then IPv4 (octets are short, but dotted runs overlap the
  * phone shape), then phones, then bare long digit runs. Detection
  * counts run against the ORIGINAL text, so they are independent of
  * the redaction order.
  */
object Pii {

  /** Email: local part of the practical RFC subset at a host with a
    * TLD. ASCII `\b`-free on purpose — `[A-Za-z0-9._%+-]+` self-anchors
    * (an adjacent word char would be part of the match). */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 with exact octet ranges, word-bounded so version
    * strings like `1.2.3.4.5` still match only a leading quad (the
    * standard over-match trade both engines share). */
  val Ipv4Re: String =
    "\\b(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])" +
      "(\\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])){3}\\b"

  /** NANP-style phone: optional +1/1 prefix, 3-3-4 digit groups with
    * `-`, `.`, or space separators (both separators must be present —
    * bare 10-digit runs are [[LongDigitsRe]]'s to claim). */
  val PhoneRe: String =
    "\\+?\\b(1[-. ])?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** Bare digit runs of 9+ (SSN-ish, account/card-number-ish) — the
    * conservative catch-all after the structured detectors have run. */
  val LongDigitsRe: String = "\\b[0-9]{9,}\\b"

  /** The detectors in their load-bearing application order. */
  val Detectors: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "<EMAIL>"),
    ("ipv4", Ipv4Re, "<IP>"),
    ("phone", PhoneRe, "<PHONE>"),
    ("id", LongDigitsRe, "<ID>"))

  /** `text` with all four PII classes replaced by placeholder tokens,
    * in the documented order. Null text stays null. */
  def redact(text: Column): Column =
    Detectors.foldLeft(text) { case (c, (_, re, repl)) =>
      regexp_replace(c, re, repl)
    }

  /** Per-class match counts over the ORIGINAL text:
    * `struct(n_email, n_ipv4, n_phone, n_id)`. */
  def counts(text: Column): Column =
    struct(Detectors.map { case (name, re, _) =>
      regexp_count(text, lit(re)).cast("long").as(s"n_$name")
    }: _*)

  /** Scrub `textCol` in place and append the per-class counts — the
    * one-pass release-pipeline form. */
  def scrub(df: DataFrame, textCol: String,
            countsCol: String = "pii_counts"): DataFrame =
    df.withColumn(countsCol, counts(col(textCol)))
      .withColumn(textCol, redact(col(textCol)))

  /** Rows whose text contains NO detectable PII — the strict-release
    * filter (drop rather than redact). */
  def filterClean(df: DataFrame, textCol: String): DataFrame = {
    val anyHit = Detectors.map { case (_, re, _) =>
      regexp_count(col(textCol), lit(re)) > 0
    }.reduce(_ || _)
    df.filter(col(textCol).isNull || !anyHit)
  }
}
