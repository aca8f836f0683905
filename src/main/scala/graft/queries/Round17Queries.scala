package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.merge.ScdMerge

/** Round-17 additions: the NULL-dense SCD change chain (r16 VERDICT #2)
  * and the BM25 → containment two-stage decontamination triage
  * (r16 VERDICT #4). */
object Round17Queries {

  // ---- q_merge_scd_null ----------------------------------------------------

  /** Tracked column names of the NULL-dense merge fixture: 12 mixed-type
    * columns, the i % 3 == 0 third ({n00, n03, n06, n09}) carrying
    * injected NULLs on both snapshots. */
  private[graft] val nullMergeCols: Seq[String] =
    (0 until 12).map(i => f"n$i%02d")

  /** One snapshot of the NULL-dense fixture. Column recipes are
    * deterministic functions of the SAME orders row (so an unperturbed
    * key compares EQUAL across snapshots — the q_merge_scd_wide
    * discipline), with two deliberate differences between sides:
    *
    *  - every i % 3 == 0 STRING column gets NULL injected by a
    *    per-(key, column) hash h = (id·31 + i) mod 23: snapshot A is
    *    NULL on h ∈ {0, 2}, snapshot B on h ∈ {1, 2} — so h = 0 is a
    *    NULL→value transition, h = 1 value→NULL, h = 2 NULL→NULL, and
    *    everything else value→value-same. All four NULL transition
    *    classes provably occur (NullMergeSpec counts them from the
    *    DATA), which is what the reference's stringwise diff
    *    (feeder_postgres.py:162 `str(csv) != str(db)` after the
    *    :127-129 NULL/empty normalization) is actually about — SURVEY
    *    §7.4's first hard part. q_merge_scd_wide keeps the width story
    *    (53 columns); this row keeps the NULL story.
    *  - snapshot B perturbs the DOUBLE column n01 (+0.5 on keys ≡ 0
    *    mod 13) so the plain value→value-changed class occurs beside
    *    the NULL classes.
    *
    * The change decision under test is [[ScdMerge]]'s null-safe `<=>`
    * OR-chain: updated_at must move iff some transition is h ∈ {0, 1}
    * or the n01 perturbation — and must NOT move on NULL→NULL (a
    * naive `=!=` chain returns NULL there and silently never fires). */
  private[graft] def nullSnap(s: SparkSession, dir: String, isB: Boolean,
      cond: org.apache.spark.sql.Column): DataFrame = {
    val cols = (0 until 12).map { i =>
      val base = i % 3 match {
        case 0 => concat_ws(":", lit(i), col("o_orderstatus"),
          col("o_orderpriority"))
        case 1 => col("o_totalprice").cast("double") + lit(i.toDouble)
        case _ => col("o_custkey") + lit(i.toLong)
      }
      val c =
        if (i % 3 == 0) {
          val h = pmod(col("o_orderkey") * 31 + lit(i.toLong), lit(23L))
          val nullOn: Seq[Long] = if (isB) Seq(1L, 2L) else Seq(0L, 2L)
          when(h.isin(nullOn: _*), lit(null).cast("string")).otherwise(base)
        } else if (isB && i == 1)
          when(pmod(col("o_orderkey"), lit(13L)) === 0, base + lit(0.5))
            .otherwise(base)
        else base
      c.as(f"n$i%02d")
    }
    table(s, dir, "orders").filter(cond)
      .select(col("o_orderkey").as("id") +: cols: _*)
  }

  private[graft] def nullSnapA(s: SparkSession, dir: String): DataFrame =
    nullSnap(s, dir, isB = false,
      col("o_orderdate") < lit("1997-07-01").cast("timestamp"))

  private[graft] def nullSnapB(s: SparkSession, dir: String): DataFrame =
    nullSnap(s, dir, isB = true,
      col("o_orderdate") >= lit("1996-06-01").cast("timestamp"))

  /** NULL-dense SCD merge: two snapshots through
    * [[ScdMerge.applySnapshot]] whose tracked columns carry every NULL
    * transition class (see [[nullSnap]]), oracled end-to-end — the
    * DuckDB side re-derives the change decision from the same
    * membership + hash rules, so a `<=>` chain that mishandles any
    * NULL class diverges on updated_at, and the emitted n00 column
    * additionally pins that the STATE keeps the latest snapshot's
    * NULLs (not coalesced-away values). Same 100 TB shape as
    * q_merge_scd: one full-outer SMJ per snapshot on the key. */
  private val mergeScdNull = Q("q_merge_scd_null",
    (s, dir) => {
      val a = nullSnapA(s, dir)
      val b = nullSnapB(s, dir)
      val s1 = ScdMerge.applySnapshot(
        ScdMerge.emptyState(a), a, "1998-01-01", "id", nullMergeCols)
      val s2 = ScdMerge.applySnapshot(s1, b, "1998-06-01", "id", nullMergeCols)
      s2.select(col("id"), col("n00"), col("n01"),
          date_format(col("added_at"), "yyyy-MM-dd").as("added_at"),
          date_format(col("updated_at"), "yyyy-MM-dd").as("updated_at"),
          date_format(col("removed_at"), "yyyy-MM-dd").as("removed_at"))
    },
    Some("""WITH a AS (SELECT o_orderkey AS id FROM orders
                       WHERE o_orderdate < TIMESTAMP '1997-07-01'),
                 b AS (SELECT o_orderkey AS id FROM orders
                       WHERE o_orderdate >= TIMESTAMP '1996-06-01'),
                 v AS (SELECT o_orderkey AS id,
                              concat_ws(':', '0', o_orderstatus, o_orderpriority) AS n00v,
                              CAST(o_totalprice AS DOUBLE) + 1.0 AS n01v
                       FROM orders)
            SELECT coalesce(a.id, b.id) AS id,
                   CASE WHEN b.id IS NOT NULL
                        THEN CASE WHEN (v.id * 31) % 23 IN (1, 2) THEN NULL ELSE v.n00v END
                        ELSE CASE WHEN (v.id * 31) % 23 IN (0, 2) THEN NULL ELSE v.n00v END
                   END AS n00,
                   CASE WHEN b.id IS NOT NULL AND v.id % 13 = 0
                        THEN v.n01v + 0.5 ELSE v.n01v END AS n01,
                   CASE WHEN a.id IS NOT NULL THEN '1998-01-01'
                        ELSE '1998-06-01' END AS added_at,
                   CASE WHEN a.id IS NULL THEN '1998-06-01'
                        WHEN b.id IS NULL THEN '1998-01-01'
                        WHEN (v.id * 31 + 0) % 23 IN (0, 1)
                          OR (v.id * 31 + 3) % 23 IN (0, 1)
                          OR (v.id * 31 + 6) % 23 IN (0, 1)
                          OR (v.id * 31 + 9) % 23 IN (0, 1)
                          OR v.id % 13 = 0 THEN '1998-06-01'
                        ELSE '1998-01-01' END AS updated_at,
                   CASE WHEN b.id IS NULL THEN '1998-06-01' ELSE NULL END AS removed_at
            FROM a FULL OUTER JOIN b ON a.id = b.id
            JOIN v ON v.id = coalesce(a.id, b.id)
            ORDER BY id"""))

  // ---- q_retrieval_decon ---------------------------------------------------

  /** Two-stage decontamination triage ([[graft.extensions.TextAnalysis
    * .retrievalDecon]]): BM25 top-20 retrieval over the training slice
    * (q_decontaminate's doc_id % 10 ≠ 0 convention, benchmark = the
    * % 10 = 0 docs) for the benchmark prompt's term bag, then the
    * 4-gram containment pass over ONLY those 20 candidates — the
    * corpus never pays the gram join. PlanAssertionsSpec pins the
    * k-bounded left side (TakeOrderedAndProject inside the broadcast
    * build of the text-fetch join). */
  private val retrievalDecon = Q("q_retrieval_decon",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      graft.extensions.TextAnalysis.retrievalDecon(
        docs.filter(ExtensionQueries.corpusSide(col("doc_id"))),
        docs.filter(ExtensionQueries.heldOut(col("doc_id"))),
        Seq("spark", "vector", "stream"), k = 20, n = 4)
    },
    Some(s"""WITH ${Round16Queries.duckBm25(" WHERE doc_id % 10 <> 0")},
                 topk AS (SELECT doc_id, round(CAST(sum(c) AS DOUBLE), 4) AS bm25
                          FROM contrib GROUP BY 1
                          ORDER BY bm25 DESC, doc_id LIMIT 20),
                 g AS (SELECT doc_id,
                              len(list_filter(string_split(lower(coalesce(text, '')), ' '),
                                              t -> t <> '')) AS n,
                              list_filter(string_split(lower(coalesce(text, '')), ' '),
                                          t -> t <> '') AS arr
                       FROM documents),
                 grams AS (SELECT doc_id,
                                  unnest(CASE WHEN n < 4 THEN []
                                         ELSE list_transform(range(1, CAST(n AS INTEGER) - 2),
                                                i -> array_to_string(arr[i : i + 3], ' '))
                                         END) AS gram
                           FROM g),
                 bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0),
                 cg AS (SELECT DISTINCT grams.doc_id, gram
                        FROM grams JOIN topk USING (doc_id)),
                 ng AS (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY 1),
                 sh AS (SELECT cg.doc_id, count(*) AS n_shared
                        FROM cg JOIN bench USING (gram) GROUP BY 1)
            SELECT t.doc_id, t.bm25,
                   coalesce(ng.n_grams, 0) AS n_grams,
                   coalesce(sh.n_shared, 0) AS n_shared,
                   CASE WHEN coalesce(ng.n_grams, 0) > 0
                        THEN round(coalesce(sh.n_shared, 0) * 1.0 / ng.n_grams, 4)
                        ELSE 0.0 END AS containment,
                   coalesce(sh.n_shared, 0) > 0 AS contaminated
            FROM topk t LEFT JOIN ng USING (doc_id) LEFT JOIN sh USING (doc_id)
            ORDER BY t.bm25 DESC, t.doc_id"""))

  // ---- q_hybrid_rrf ----------------------------------------------------

  /** Hybrid retrieval ([[graft.extensions.Similarity.hybridRrf]]):
    * Reciprocal Rank Fusion of the BM25 lexical top-50 (q_bm25's term
    * bag) and the cosine semantic top-50 (q_ann_cosine's query vector,
    * vec_id ≡ doc_id — the tables are the same 1:1 corpus), fused as
    * Σ 1/(60 + rank) and cut to the top-10. Both channels and the
    * fusion are rank-based with total-order tiebreaks, so the row is
    * bitwise-deterministic despite mixing two incomparable score
    * scales. */
  private val hybridRrf = Q("q_hybrid_rrf",
    (s, dir) => graft.extensions.Similarity.hybridRrf(
      table(s, dir, "documents"), table(s, dir, "embeddings"),
      Seq("spark", "vector", "stream")),
    Some(s"""WITH ${Round16Queries.duckBm25("")},
                 lexk AS (SELECT doc_id, round(CAST(sum(c) AS DOUBLE), 4) AS bm25
                          FROM contrib GROUP BY 1
                          ORDER BY bm25 DESC, doc_id LIMIT 50),
                 lex AS (SELECT doc_id,
                                CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                                     AS BIGINT) AS lex_rank
                         FROM lexk),
                 ${ExtensionQueries.duckNorm},
                 q AS (SELECT e AS qe, nrm AS qn FROM nn WHERE vec_id = 0),
                 semk AS (SELECT vec_id,
                                 round(list_sum(list_transform(range(1, len(e) + 1),
                                                               i -> e[i] * qe[i]))
                                       / (nrm * qn), 4) AS cos_r
                          FROM nn, q WHERE vec_id <> 0
                          ORDER BY cos_r DESC, vec_id LIMIT 50),
                 sem AS (SELECT vec_id AS doc_id,
                                CAST(row_number() OVER (ORDER BY cos_r DESC, vec_id)
                                     AS BIGINT) AS sem_rank
                         FROM semk)
            SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
                   lex_rank, sem_rank,
                   round(coalesce(1.0 / (60 + lex_rank), 0)
                         + coalesce(1.0 / (60 + sem_rank), 0), 6) AS rrf
            FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
            ORDER BY rrf DESC, doc_id LIMIT 10"""))

  // ---- q_classifier_score ----------------------------------------------

  /** Bootstrap quality classifier ([[graft.extensions.TextAnalysis
    * .classifierScore]]): NB log-count-ratio weights trained on the
    * corpus' own length-median weak label, swept back over every
    * document — training and inference both oracle-reproduced. */
  private val classifierScore = Q("q_classifier_score",
    (s, dir) => graft.extensions.TextAnalysis.classifierScore(
      table(s, dir, "documents")),
    Some("""WITH d AS (SELECT doc_id, n_chars,
                              list_filter(string_split(lower(coalesce(text, '')), ' '),
                                          t -> t <> '') AS arr
                       FROM documents),
                 dd AS (SELECT doc_id, n_chars, arr, len(arr) AS dl
                        FROM d WHERE len(arr) > 0),
                 md AS (SELECT median(n_chars) AS med FROM dd),
                 t AS (SELECT doc_id, n_chars > md.med AS good,
                              unnest(arr) AS tok
                       FROM dd, md),
                 cc AS (SELECT tok,
                               sum(CASE WHEN good THEN 1 ELSE 0 END) AS tfg,
                               sum(CASE WHEN good THEN 0 ELSE 1 END) AS tfb
                        FROM t GROUP BY 1),
                 tot AS (SELECT sum(tfg) AS tg, sum(tfb) AS tb,
                                count(*) AS v
                         FROM cc),
                 w AS (SELECT tok,
                              round(ln(((tfg + 1.0) / (tg + v))
                                       / ((tfb + 1.0) / (tb + v))), 6) AS w
                       FROM cc, tot),
                 tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
                 c AS (SELECT tf.doc_id,
                              CAST(round(w.w * tf.tf, 6) AS DECIMAL(18,6)) AS c
                       FROM tf JOIN w USING (tok)),
                 sc AS (SELECT c.doc_id, sum(c.c) AS s FROM c GROUP BY 1),
                 out AS (SELECT dd.doc_id,
                                CAST(dd.dl AS BIGINT) AS n_toks,
                                round(CAST(sc.s AS DOUBLE) / dd.dl, 4) + 0.0 AS score
                         FROM dd JOIN sc ON dd.doc_id = sc.doc_id)
            SELECT doc_id, n_toks, score, score > 0.0 AS keep
            FROM out ORDER BY doc_id"""))

  // ---- q_semantic_decon --------------------------------------------------

  /** Semantic decontamination ([[graft.extensions.Similarity
    * .semanticDecon]]): the vec_id % 10 = 0 embeddings play the
    * held-out benchmark (the q_decontaminate membership convention in
    * embedding space); every remaining corpus vector reports its
    * same-cell benchmark hits at cosine ≥ 0.3 — NULL max_cos
    * distinguishes "no benchmark in my cell" from "compared and
    * clean". */
  private val semanticDecon = Q("q_semantic_decon",
    (s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.extensions.Similarity.semanticDecon(
        emb.filter(ExtensionQueries.corpusSide(col("vec_id"))),
        emb.filter(ExtensionQueries.heldOut(col("vec_id"))))
    },
    Some(s"""WITH ${ExtensionQueries.duckNorm},
                 c AS (SELECT vec_id, label, e, nrm FROM nn
                       WHERE vec_id % 10 <> 0),
                 b AS (SELECT label AS blabel, e AS be, nrm AS bnrm
                       FROM nn WHERE vec_id % 10 = 0),
                 p AS (SELECT c.vec_id,
                              round(list_sum(list_transform(range(1, len(c.e) + 1),
                                                            i -> c.e[i] * b.be[i]))
                                    / (c.nrm * b.bnrm), 4) AS cos_r
                       FROM c JOIN b ON c.label = b.blabel),
                 h AS (SELECT vec_id,
                              CAST(sum(CASE WHEN cos_r >= 0.3 THEN 1 ELSE 0 END)
                                   AS BIGINT) AS n_hits,
                              max(cos_r) AS max_cos
                       FROM p GROUP BY 1)
            SELECT c.vec_id,
                   coalesce(h.n_hits, 0) AS n_hits,
                   h.max_cos,
                   coalesce(h.n_hits, 0) > 0 AS contaminated
            FROM c LEFT JOIN h ON c.vec_id = h.vec_id
            ORDER BY c.vec_id"""))

  // ---- q_decon_tri ---------------------------------------------------------

  /** The decon DASHBOARD: every training document's verdict across the
    * two whole-corpus channels — n-gram containment
    * ([[graft.extensions.TextAnalysis.decontaminate]], the surface-leak
    * channel) and embedding cosine ([[graft.extensions.Similarity
    * .semanticDecon]], the paraphrase channel) — joined 1:1 on
    * doc_id ≡ vec_id and attributed (`gram` / `sem` / `both` / `none`),
    * the report a scrub run actually publishes (the third channel,
    * retrieval triage, is k-bounded by design and reported separately
    * by q_retrieval_decon). Both legs keep their own membership
    * convention (id % 10 = 0 plays the held-out set in both spaces).
    *
    * Scale shape: both channels broadcast their benchmark-sized dim and
    * keep the corpus side narrow; the final join is corpus-row 1:1 on
    * the primary key. */
  private val deconTri = Q("q_decon_tri",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val emb = table(s, dir, "embeddings")
      val gram = graft.extensions.TextAnalysis.decontaminate(
          docs.filter(ExtensionQueries.corpusSide(col("doc_id"))),
          docs.filter(ExtensionQueries.heldOut(col("doc_id"))), n = 4)
        .select(col("doc_id"), col("n_shared").as("gram_hits"))
      val sem = graft.extensions.Similarity.semanticDecon(
          emb.filter(ExtensionQueries.corpusSide(col("vec_id"))),
          emb.filter(ExtensionQueries.heldOut(col("vec_id"))))
        .select(col("vec_id").as("doc_id"), col("n_hits").as("sem_hits"),
          col("max_cos"))
      // LEFT join: at sf ≥ 0.1 only a subset of documents carries an
      // embedding row — those docs still belong on the dashboard with
      // sem_hits 0 / max_cos NULL (the semantic channel could not run),
      // exactly like a doc whose cell holds no benchmark (caught by the
      // tri-scale sweep: an inner join silently dropped 2,700 docs at
      // sf0.1 while matching at sf0.01's 1:1 coverage)
      gram.join(sem, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("gram_hits"),
          coalesce(col("sem_hits"), lit(0L)).as("sem_hits"),
          col("max_cos"),
          when(col("gram_hits") > 0 && coalesce(col("sem_hits"), lit(0L)) > 0,
            lit("both"))
            .when(col("gram_hits") > 0, lit("gram"))
            .when(coalesce(col("sem_hits"), lit(0L)) > 0, lit("sem"))
            .otherwise(lit("none")).as("channel"))
    },
    Some(s"""WITH g AS (SELECT doc_id,
                              len(list_filter(string_split(lower(coalesce(text, '')), ' '),
                                              t -> t <> '')) AS n,
                              list_filter(string_split(lower(coalesce(text, '')), ' '),
                                          t -> t <> '') AS arr
                       FROM documents),
                 grams AS (SELECT doc_id,
                                  unnest(CASE WHEN n < 4 THEN []
                                         ELSE list_transform(range(1, CAST(n AS INTEGER) - 2),
                                                i -> array_to_string(arr[i : i + 3], ' '))
                                         END) AS gram
                           FROM g),
                 bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0),
                 train AS (SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 10 <> 0),
                 gh AS (SELECT doc_id, count(*) AS gram_hits
                        FROM train JOIN bench USING (gram) GROUP BY 1),
                 ${ExtensionQueries.duckNorm},
                 c AS (SELECT vec_id, label, e, nrm FROM nn
                       WHERE vec_id % 10 <> 0),
                 b AS (SELECT label AS blabel, e AS be, nrm AS bnrm
                       FROM nn WHERE vec_id % 10 = 0),
                 p AS (SELECT c.vec_id,
                              round(list_sum(list_transform(range(1, len(c.e) + 1),
                                                            i -> c.e[i] * b.be[i]))
                                    / (c.nrm * b.bnrm), 4) AS cos_r
                       FROM c JOIN b ON c.label = b.blabel),
                 sh AS (SELECT vec_id,
                              CAST(sum(CASE WHEN cos_r >= 0.3 THEN 1 ELSE 0 END)
                                   AS BIGINT) AS sem_hits,
                              max(cos_r) AS max_cos
                       FROM p GROUP BY 1),
                 tri AS (SELECT d.doc_id,
                                coalesce(gh.gram_hits, 0) AS gram_hits,
                                coalesce(sh.sem_hits, 0) AS sem_hits,
                                sh.max_cos
                         FROM documents d
                           LEFT JOIN gh ON gh.doc_id = d.doc_id
                           LEFT JOIN sh ON sh.vec_id = d.doc_id
                         WHERE d.doc_id % 10 <> 0)
            SELECT doc_id, gram_hits, sem_hits, max_cos,
                   CASE WHEN gram_hits > 0 AND sem_hits > 0 THEN 'both'
                        WHEN gram_hits > 0 THEN 'gram'
                        WHEN sem_hits > 0 THEN 'sem'
                        ELSE 'none' END AS channel
            FROM tri ORDER BY doc_id"""))

  // ---- soft dedup ----------------------------------------------------------

  /** Soft dedup weights ([[graft.extensions.Dedup.softDedupWeights]]):
    * 1/|near-dup component| per document — down-weighting instead of
    * dropping. Oracle rides the shared recursive CC closure. */
  private val softDedup = Q("q_soft_dedup",
    (s, dir) => graft.extensions.Dedup
      .softDedupWeights(table(s, dir, "documents")),
    Some(s"""WITH RECURSIVE ${ExtensionQueries.duckCcReach},
             comps AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id),
             szs AS (SELECT comp, CAST(count(*) AS BIGINT) AS cluster_size
                     FROM comps GROUP BY 1)
             SELECT doc_id, comps.comp, cluster_size,
                    round(1.0 / cluster_size, 6) AS weight
             FROM comps JOIN szs ON comps.comp = szs.comp
             ORDER BY doc_id"""))

  /** Per-source dedup-adjusted mass ([[graft.extensions.Dedup
    * .softDedupMass]]): raw count vs Σ 1/|comp| — what a mixture step
    * feeds its sampling rates so duplicated sources don't buy weight
    * with copies. */
  private val softDedupMass = Q("q_soft_dedup_mass",
    (s, dir) => graft.extensions.Dedup
      .softDedupMass(table(s, dir, "documents")),
    Some(s"""WITH RECURSIVE ${ExtensionQueries.duckCcReach},
             comps AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id),
             szs AS (SELECT comp, count(*) AS sz FROM comps GROUP BY 1),
             w AS (SELECT doc_id,
                          CAST(round(1.0 / sz, 6) AS DECIMAL(18,6)) AS w
                   FROM comps JOIN szs ON comps.comp = szs.comp),
             agg AS (SELECT d.source,
                            CAST(count(*) AS BIGINT) AS n_docs,
                            sum(w.w) AS eff
                     FROM documents d JOIN w ON w.doc_id = d.doc_id
                     GROUP BY 1)
             SELECT source, n_docs,
                    round(CAST(eff AS DOUBLE), 4) AS eff_docs,
                    round(CAST(eff AS DOUBLE) / n_docs, 4) AS dedup_ratio
             FROM agg ORDER BY source"""))

  /** Dedup-aware mixture plan ([[graft.extensions.Mixture
    * .effectiveTotalsOf]] ∘ planFromTotals): the q_mixture_plan
    * contract re-planned over EFFECTIVE token mass (Σ (1/|near-dup
    * component|)·n_tok per source, floored), so a source that padded
    * its holdings with duplicate clusters serves a smaller share of the
    * same target mixture — the soft-dedup weights composed into the
    * data-mixing step end to end. Oracle re-derives the CC closure, the
    * effective totals, and the integer plan arithmetic. */
  private val mixtureSoft = Q("q_mixture_soft",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      graft.extensions.Mixture.planFromTotals(
        graft.extensions.Mixture.effectiveTotalsOf(docs),
        Round14Queries.testWeights(s, dir))
    },
    Some(s"""WITH RECURSIVE ${ExtensionQueries.duckCcReach},
             comps AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id),
             szs AS (SELECT comp, count(*) AS sz FROM comps GROUP BY 1),
             dw AS (SELECT doc_id, round(1.0 / sz, 6) AS dwt
                    FROM comps JOIN szs ON comps.comp = szs.comp),
             t AS (${Round14Queries.tokSql}),
             tot0 AS (SELECT source,
                             CAST(floor(sum(CAST(round(dwt * n_tok, 6)
                                                 AS DECIMAL(28,6)))) AS BIGINT)
                               AS tokens_total
                      FROM t JOIN dw ON t.doc_id = dw.doc_id
                      GROUP BY source),
             wts AS (${Round14Queries.weightsSql}),
             tot AS (SELECT wts.source,
                            CAST(coalesce(tokens_total, 0) AS BIGINT)
                              AS tokens_total,
                            weight
                     FROM wts LEFT JOIN tot0 ON wts.source = tot0.source
                     WHERE weight > 0),
             ws AS (SELECT CAST(sum(weight) AS BIGINT) AS w_sum FROM wts
                    WHERE weight > 0),
             b AS (SELECT CAST(min((tokens_total * w_sum) // weight) AS BIGINT)
                            AS budget
                   FROM tot, ws)
             SELECT source, tokens_total, weight, budget,
                    (weight * budget) // w_sum AS keep_tokens,
                    CASE WHEN tokens_total = 0 THEN CAST(0 AS BIGINT)
                         ELSE ((weight * budget * 2) // w_sum
                                 + tokens_total - 1) // tokens_total
                    END AS epochs_at_2x
             FROM tot, ws, b ORDER BY source"""))

  /** The semantic channel's eval-integrity readout
    * ([[graft.extensions.Similarity.semanticReport]]): per held-out
    * embedding, how many corpus vectors sit within cosine 0.3 in its
    * cell — the q_contamination_report ↔ q_decontaminate symmetry, in
    * embedding space. */
  private val semanticReport = Q("q_semantic_report",
    (s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.extensions.Similarity.semanticReport(
        emb.filter(ExtensionQueries.corpusSide(col("vec_id"))),
        emb.filter(ExtensionQueries.heldOut(col("vec_id"))))
    },
    Some(s"""WITH ${ExtensionQueries.duckNorm},
                 c AS (SELECT label AS clabel, e AS ce, nrm AS cnrm
                       FROM nn WHERE vec_id % 10 <> 0),
                 b AS (SELECT vec_id AS bench_id, label, e, nrm FROM nn
                       WHERE vec_id % 10 = 0),
                 p AS (SELECT b.bench_id,
                              round(list_sum(list_transform(range(1, len(c.ce) + 1),
                                                            i -> c.ce[i] * b.e[i]))
                                    / (c.cnrm * b.nrm), 4) AS cos_r
                       FROM c JOIN b ON c.clabel = b.label),
                 h AS (SELECT bench_id,
                              CAST(sum(CASE WHEN cos_r >= 0.3 THEN 1 ELSE 0 END)
                                   AS BIGINT) AS n_leaks,
                              max(cos_r) AS max_cos
                       FROM p GROUP BY 1)
            SELECT b.bench_id,
                   coalesce(h.n_leaks, 0) AS n_leaks,
                   h.max_cos,
                   coalesce(h.n_leaks, 0) > 0 AS leaked
            FROM b LEFT JOIN h ON b.bench_id = h.bench_id
            ORDER BY b.bench_id"""))

  val all: Seq[Q] = Seq(mergeScdNull, retrievalDecon, hybridRrf,
    classifierScore, semanticDecon, deconTri, softDedup, softDedupMass,
    mixtureSoft, semanticReport)
}
