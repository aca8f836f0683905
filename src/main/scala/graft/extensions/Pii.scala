package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed PII scrubbing — the pre-training privacy pass every shipped
  * corpus needs (reference analog: the generic masking idea behind
  * `TextAnalysis.redact`, typed out into the classes a real pipeline
  * tracks separately because their false-positive costs differ).
  *
  * Four detectors, applied in a fixed order so later patterns never
  * re-match inside an earlier placeholder (placeholders carry no
  * digits, dots or `@`):
  *
  *   1. email     — `user@domain.tld` (local/domain char classes, no
  *                  lookaround so the pattern means the same thing in
  *                  Java regex and RE2);
  *   2. card      — 16-digit runs, redacted ONLY when the Luhn
  *                  checksum validates (Spark's built-in `luhn_check`);
  *                  invalid candidates are counted but kept — masking
  *                  every long number destroys ids/timestamps the
  *                  corpus may legitimately need;
  *   3. phone     — NNN-NNN-NNNN;
  *   4. ipv4      — dotted quads.
  *
  * Scale shape: one narrow per-row projection end to end — regex
  * compile is per-task, no shuffle, no UDF (regexp_* are codegen'd;
  * the card stage's filter/aggregate HOFs are JVM expressions over a
  * per-row candidate list that is almost always empty). At 100 TB this
  * runs at scan speed and composes into [[CorpusPipeline]] like any
  * other gate. Valid-card replacement folds a WORD-BOUNDARY-anchored
  * `regexp_replace` over the Luhn-surviving candidates (left fold,
  * first-match order) — a plain substring replace would also rewrite a
  * candidate embedded inside a LONGER digit run (where `\b` never
  * matched it), corrupting a non-card number. Both engines reproduce
  * the fold exactly — the q_pii_scrub oracle twins it with
  * `list_reduce(list_prepend(text, ok), …)` over the same anchored
  * pattern.
  */
object Pii {

  /** Shared Java/RE2 subset: no lookaround, no backrefs, ASCII `\b`. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val cardRe = "\\b[0-9]{16}\\b"
  val phoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Scrub `textCol`, emitting the clean text plus per-class match
    * counts. `keep` columns pass through untouched (for the report's
    * group-by). Counting happens on each stage's INPUT text, so a
    * class never counts matches inside another class's placeholder. */
  def scrub(
      documents: DataFrame,
      textCol: String = "text",
      keep: Seq[String] = Seq("source")): DataFrame = {
    val kept = keep.map(col)
    documents
      .select(col("doc_id") +: kept :+
        coalesce(col(textCol), lit("")).as("_t0"): _*)
      // r20 (guide §1.2 step 2): counts via regexp_count — the old
      // size(regexp_extract_all(...)) materialized every match string
      // into an array just to take its length; regexp_count runs the
      // same find() loop with no per-match allocation. Same values
      // (both count non-overlapping matches left to right). The card
      // stage keeps extract_all — its matches feed the Luhn filter.
      .withColumn("n_email",
        regexp_count(col("_t0"), lit(emailRe)).cast("long"))
      .withColumn("_t1", regexp_replace(col("_t0"), emailRe, "<EMAIL>"))
      .withColumn("_cand", regexp_extract_all(col("_t1"), lit(cardRe), lit(0)))
      .withColumn("_ok", expr("filter(_cand, c -> luhn_check(c))"))
      .withColumn("n_card", size(col("_ok")).cast("long"))
      .withColumn("n_card_invalid",
        (size(col("_cand")) - size(col("_ok"))).cast("long"))
      .withColumn("_t2",
        aggregate(col("_ok"), col("_t1"), (acc, x) =>
          call_function("regexp_replace", acc,
            concat(lit("\\b"), x, lit("\\b")), lit("<CARD>"))))
      .withColumn("n_phone",
        regexp_count(col("_t2"), lit(phoneRe)).cast("long"))
      .withColumn("_t3", regexp_replace(col("_t2"), phoneRe, "<PHONE>"))
      .withColumn("n_ipv4",
        regexp_count(col("_t3"), lit(ipv4Re)).cast("long"))
      .withColumn("clean", regexp_replace(col("_t3"), ipv4Re, "<IP>"))
      .select(col("doc_id") +: kept :+ col("clean") :+ col("n_email") :+
        col("n_card") :+ col("n_card_invalid") :+ col("n_phone") :+
        col("n_ipv4"): _*)
  }

  /** The same four-stage scrub as a pure Column (no per-class counts)
    * — the form compositions embed ([[TrainingSet.compose]]'s
    * `piiScrub` leg wraps the packed text in it). Kept in lockstep
    * with [[scrub]] by a GatesSpec parity pin (cleanColumn(text) ≡
    * scrub(...).clean on the synthesized corpus).
    *
    * Whitespace-token-count invariant: no pattern can span a space and
    * no placeholder contains one, so the scrub replaces within tokens
    * and never changes `size(split(text, ' '))` — which is why it can
    * run AFTER budget-derived packing decisions without re-chunking
    * anything (also spec-pinned). */
  def cleanColumn(c: Column): Column = {
    val t1 = regexp_replace(coalesce(c, lit("")), emailRe, "<EMAIL>")
    val ok = filter(regexp_extract_all(t1, lit(cardRe), lit(0)),
      x => call_function("luhn_check", x))
    val t2 = aggregate(ok, t1, (acc, x) =>
      call_function("regexp_replace", acc,
        concat(lit("\\b"), x, lit("\\b")), lit("<CARD>")))
    val t3 = regexp_replace(t2, phoneRe, "<PHONE>")
    regexp_replace(t3, ipv4Re, "<IP>")
  }

  /** Per-source totals over [[scrub]] — the privacy-review artifact
    * beside the corpus [[DataCard]]: how much of each class was
    * removed, how many docs were touched at all. One narrow pass + one
    * small aggregation (rows = sources). */
  def report(
      documents: DataFrame,
      textCol: String = "text"): DataFrame =
    scrub(documents, textCol)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_email") + col("n_card") + col("n_phone") +
          col("n_ipv4") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
        sum("n_email").as("n_email"),
        sum("n_card").as("n_card"),
        sum("n_card_invalid").as("n_card_invalid"),
        sum("n_phone").as("n_phone"),
        sum("n_ipv4").as("n_ipv4"))

  /** Deterministic PII-bearing text for oracle rows and specs: the
    * testdata corpus is synthetic word salad with no PII shapes in it,
    * so the q rows append a contact line derived from `doc_id` — built
    * identically (same concat, same integer formatting) by the DuckDB
    * twin — with one email, one phone, one IP, and a card that is
    * Luhn-VALID on even doc_ids and INVALID on odd ones, so both
    * checksum branches engage on every other row. */
  def synthText: Column =
    concat(
      coalesce(col("text"), lit("")),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@ex"), (col("doc_id") % 7).cast("string"),
      lit(".org or 555-010-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" card "),
      when(col("doc_id") % 2 === 0, lit("4532015112830366"))
        .otherwise(lit("4532015112830367")),
      lit(" at 10."), (col("doc_id") % 256).cast("string"),
      lit(".0.1 end"))
}
