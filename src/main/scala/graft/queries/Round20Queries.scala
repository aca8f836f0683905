package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-20 additions. Headline: the Bloom two-pass line-dedup path
  * ([[graft.extensions.LineDedup.dedupLinesBloom]]) — the repo's last
  * prose scale claim turned into a driver-verified row (r19 VERDICT
  * #1): the exact-df census that TimeLineLever measured at ~half the
  * family's sf100 cost is replaced by an 8-byte-key census folded into
  * a broadcast Bloom bitset plus a codegen'd scan-side probe (no
  * anti-join). Verified under q_line_dedup's oracle VERBATIM — on the
  * harness corpus the filter is sized so the expected false-positive
  * count is ≪ 1, making the keep-zero scrub bit-identical to the
  * exact path (the FP-tolerance contract is explicit in the operator's
  * scaladoc and spec-pinned with a deliberately undersized filter in
  * LineDedupBloomSpec). */
object Round20Queries {

  /** [[graft.extensions.LineDedup.dedupLinesBloom]] under q_line_dedup's
    * oracle verbatim: census on xxhash64(line) only, dup set as a
    * broadcast Bloom, scrub as a scan-side probe filter. Defaults size
    * the filter for exactness here (fpp 1e-9 against ~10⁵ distinct
    * harness lines ⇒ expected false drops ~10⁻⁴). */
  private val lineDedupBloom = Q("q_line_dedup_bloom",
    (s, dir) => graft.extensions.LineDedup
      .dedupLinesBloom(table(s, dir, "documents"), lineLen = 6, maxDf = 1)
      .orderBy("doc_id"),
    Some(Round19Queries.duckLineDedup))

  val all: Seq[Q] = Seq(lineDedupBloom)
}
