package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.extensions.{Dedup, Similarity, TextAnalysis}

/** LLM-training-data-pipeline operators (SURVEY.md §7.1 step 7) as
  * driver-verifiable queries over `documents` / `embeddings`. Hashing is
  * md5-based and arithmetic is double-exact so every query has a bitwise
  * DuckDB oracle. */
object ExtensionQueries {

  private val dedupExact = Q("q_dedup_exact",
    (s, dir) => Dedup.exact(table(s, dir, "documents")),
    Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_dups FROM documents
            GROUP BY md5(lower(coalesce(text, ''))) ORDER BY keep_id"""))

  private val dedupMinhash = Q("q_dedup_minhash",
    (s, dir) => Dedup.minHashLsh(table(s, dir, "documents")),
    Some("""WITH sh AS (SELECT DISTINCT doc_id, s FROM
                          (SELECT doc_id,
                                  unnest(list_transform(
                                    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                                    i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))) AS s
                           FROM documents)),
                 sigs AS (SELECT doc_id, sd.seed,
                                 min(md5(CAST(sd.seed AS VARCHAR) || ':' || s)) AS mh
                          FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) sd
                          GROUP BY 1, 2),
                 buckets AS (SELECT doc_id, CAST(floor(seed / 4) AS INTEGER) AS band,
                                    md5(string_agg(mh, '|' ORDER BY seed)) AS bkey
                             FROM sigs GROUP BY 1, 2)
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM buckets x JOIN buckets y
              ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
            ORDER BY a, b"""))

  /** Incremental-ingest demo: docs with doc_id % 7 == 3 play the arriving
    * batch; the rest are the already-indexed corpus. Only the batch side
    * is shingled/bucketed at query time — the corpus index is a
    * standalone frame (in production: a persisted parquet). */
  private val dedupIncremental = Q("q_dedup_incremental",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      // No memoization on either stage (the per-run-build intent: the
      // index build is priced in every bench rep). r20: the build uses
      // the ROW-LOCAL banding (BandBucketsParitySpec pins identical
      // rows) — one narrow projection per doc instead of the exploded
      // shingle frame's collect_set shuffle, so the per-rep index
      // build prices the algorithm, not a removable exchange.
      val index = Dedup.bandBucketsRowLocal(docs.filter(col("doc_id") % 7 =!= 3))
      Dedup.lshProbe(index, docs.filter(col("doc_id") % 7 === 3))
    },
    Some("""WITH sh AS (SELECT DISTINCT doc_id, s FROM
                          (SELECT doc_id,
                                  unnest(list_transform(
                                    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                                    i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))) AS s
                           FROM documents)),
                 sigs AS (SELECT doc_id, sd.seed,
                                 min(md5(CAST(sd.seed AS VARCHAR) || ':' || s)) AS mh
                          FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) sd
                          GROUP BY 1, 2),
                 buckets AS (SELECT doc_id, CAST(floor(seed / 4) AS INTEGER) AS band,
                                    md5(string_agg(mh, '|' ORDER BY seed)) AS bkey
                             FROM sigs GROUP BY 1, 2)
            SELECT DISTINCT x.doc_id AS corpus_id, y.doc_id AS new_id
            FROM buckets x JOIN buckets y
              ON x.band = y.band AND x.bkey = y.bkey
             AND x.doc_id % 7 <> 3 AND y.doc_id % 7 = 3
            ORDER BY corpus_id, new_id"""))

  /** Shared DuckDB CTE chain computing the 64-bit shingle simhash. */
  private[queries] val simhashCtes =
    """feats AS (SELECT DISTINCT doc_id, s FROM
                   (SELECT doc_id,
                           unnest(list_transform(
                             range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                             i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))) AS s
                    FROM documents)),
       bt AS (SELECT doc_id, substr(md5(s), 1, 16) AS h4 FROM feats),
       bits AS (SELECT doc_id, bb.b,
                       (CASE substr(h4, CAST(floor(bb.b / 4) AS INTEGER) + 1, 1)
                          WHEN '0' THEN 0 WHEN '1' THEN 1 WHEN '2' THEN 2 WHEN '3' THEN 3
                          WHEN '4' THEN 4 WHEN '5' THEN 5 WHEN '6' THEN 6 WHEN '7' THEN 7
                          WHEN '8' THEN 8 WHEN '9' THEN 9 WHEN 'a' THEN 10 WHEN 'b' THEN 11
                          WHEN 'c' THEN 12 WHEN 'd' THEN 13 WHEN 'e' THEN 14 WHEN 'f' THEN 15
                        END) AS nib
                FROM bt CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bb),
       votes AS (SELECT doc_id, b,
                        sum(((nib >> CAST(b % 4 AS INTEGER)) & 1) * 2 - 1) AS s
                 FROM bits GROUP BY 1, 2),
       -- assemble the signed 64-bit value from 32-bit halves: DuckDB
       -- rejects 1 << 63 as overflow, so the high half is shifted into
       -- the sign range arithmetically
       halves AS (SELECT doc_id,
                         sum(CASE WHEN s > 0 AND b < 32
                                  THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS lo,
                         sum(CASE WHEN s > 0 AND b >= 32
                                  THEN (CAST(1 AS BIGINT) << CAST(b - 32 AS INTEGER)) ELSE 0 END) AS hi
                  FROM votes GROUP BY 1),
       -- the outer CAST matters: DuckDB sum() yields HUGEINT, and a
       -- 128-bit simhash would sign-extend through xor(), inflating the
       -- hamming distance of opposite-sign pairs by 64
       sh AS (SELECT doc_id,
                     CAST((CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
                       * 4294967296 + lo AS BIGINT) AS simhash
              FROM halves)"""

  private val dedupSimhash = Q("q_dedup_simhash",
    (s, dir) => Dedup.simHash(table(s, dir, "documents")),
    Some(s"WITH $simhashCtes SELECT doc_id, simhash FROM sh ORDER BY doc_id"))

  /** SimHash LSH: 32-bit band buckets then exact hamming filter. */
  private val dedupSimhashPairs = Q("q_dedup_simhash_pairs",
    (s, dir) => Dedup.simHashPairs(table(s, dir, "documents")),
    Some(s"""WITH $simhashCtes,
             bands AS (SELECT doc_id, simhash, bi.i,
                              CASE WHEN bi.i = 0 THEN simhash & 4294967295
                                   ELSE simhash >> 32 END AS bv
                       FROM sh CROSS JOIN (SELECT unnest(range(0, 2)) AS i) bi),
             cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
                             x.simhash AS ha, y.simhash AS hb
                      FROM bands x JOIN bands y
                        ON x.i = y.i AND x.bv = y.bv AND x.doc_id < y.doc_id)
             SELECT a, b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
             FROM cand WHERE bit_count(xor(ha, hb)) <= 3
             ORDER BY a, b"""))

  private val dedupNgram = Q("q_dedup_ngram",
    (s, dir) => Dedup.ngramJaccard(table(s, dir, "documents"), 0.3),
    Some("""WITH sh AS (SELECT DISTINCT doc_id, s FROM
                          (SELECT doc_id,
                                  unnest(list_transform(
                                    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                                    i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))) AS s
                           FROM documents)),
                 sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
                 inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                           GROUP BY 1, 2)
            SELECT inter.a, inter.b, round(i * 1.0 / (na.n + nb.n - i), 4) AS jac
            FROM inter
            JOIN sz na ON na.doc_id = inter.a
            JOIN sz nb ON nb.doc_id = inter.b
            WHERE i * 1.0 / (na.n + nb.n - i) >= 0.3
            ORDER BY a, b"""))

  /** The dictionary-encoded path of [[Dedup.ngramJaccard]] under the SAME
    * oracle as q_dedup_ngram: hashing shingles to longs is
    * result-identical absent a 64-bit collision, so the driver's
    * hash-compare verifies the encoded join end-to-end on this corpus. */
  private val dedupNgramEncoded = Q("q_dedup_ngram_encoded",
    (s, dir) => Dedup.ngramJaccard(table(s, dir, "documents"), 0.3,
      encodeShingles = true),
    Some("""WITH sh AS (SELECT DISTINCT doc_id, s FROM
                          (SELECT doc_id,
                                  unnest(list_transform(
                                    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                                    i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))) AS s
                           FROM documents)),
                 sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
                 inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                           GROUP BY 1, 2)
            SELECT inter.a, inter.b, round(i * 1.0 / (na.n + nb.n - i), 4) AS jac
            FROM inter
            JOIN sz na ON na.doc_id = inter.a
            JOIN sz nb ON nb.doc_id = inter.b
            WHERE i * 1.0 / (na.n + nb.n - i) >= 0.3
            ORDER BY a, b"""))

  /** The df=1-pruned path of [[Dedup.ngramJaccard]] under the SAME oracle
    * as q_dedup_ngram: the prune is result-preserving by construction
    * (a df=1 shingle cannot pair), so the driver's hash-compare verifies
    * the pruned code path end-to-end at sf0.01, not just in unit specs. */
  private val dedupNgramPruned = Q("q_dedup_ngram_pruned",
    (s, dir) => Dedup.ngramJaccard(table(s, dir, "documents"), 0.3,
      dropUniqueShingles = true),
    Some("""WITH sh AS (SELECT DISTINCT doc_id, s FROM
                          (SELECT doc_id,
                                  unnest(list_transform(
                                    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                                    i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))) AS s
                           FROM documents)),
                 sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
                 inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                           GROUP BY 1, 2)
            SELECT inter.a, inter.b, round(i * 1.0 / (na.n + nb.n - i), 4) AS jac
            FROM inter
            JOIN sz na ON na.doc_id = inter.a
            JOIN sz nb ON nb.doc_id = inter.b
            WHERE i * 1.0 / (na.n + nb.n - i) >= 0.3
            ORDER BY a, b"""))

  /** Shared DuckDB scaffolding: embeddings with double-cast vectors and
    * precomputed norms; dot products as ordered double folds to mirror
    * Spark's aggregate() exactly. */
  /** Shared recursive-CTE chain for the MinHash-LSH near-dup graph and
    * its transitive closure (`reach`): q_dedup_cc's per-id component is
    * `SELECT id, min(r) FROM reach GROUP BY id`; q_cc_sizes aggregates
    * the same closure into the cluster-size histogram. */
  private[queries] val duckCcReach =
    """sh AS (SELECT DISTINCT doc_id, s FROM
                          (SELECT doc_id,
                                  unnest(list_transform(
                                    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                                    i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))) AS s
                           FROM documents)),
                 sigs AS (SELECT doc_id, sd.seed,
                                 min(md5(CAST(sd.seed AS VARCHAR) || ':' || s)) AS mh
                          FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) sd
                          GROUP BY 1, 2),
                 buckets AS (SELECT doc_id, CAST(floor(seed / 4) AS INTEGER) AS band,
                                    md5(string_agg(mh, '|' ORDER BY seed)) AS bkey
                             FROM sigs GROUP BY 1, 2),
                 pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                           FROM buckets x JOIN buckets y
                             ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
                 edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
                 reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
                           UNION
                           SELECT e.b AS id, reach.r
                           FROM reach JOIN edges e ON reach.id = e.a)"""

  private[queries] val duckNorm =
    """ne AS (SELECT vec_id, label,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings),
       nn AS (SELECT vec_id, label, e,
                     sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
              FROM ne)"""

  /** The held-out membership convention every decontamination /
    * leakage row shares (r17 VERDICT #8): key % [[HeldOutMod]] == 0
    * plays the benchmark (held-out) side, the rest the corpus being
    * cleaned — doc_id for text rows, vec_id for embedding rows (the
    * tables are the same 1:1 corpus). ONE constant + two predicates so
    * a future row can't quietly pick `% 7` and stop agreeing with the
    * family; the oracles state the convention literally
    * ("% 10 = 0" / "% 10 <> 0") and SharedCteSpec pins the literal and
    * the constant to each other. */
  private[queries] val HeldOutMod = 10
  private[queries] def heldOut(key: Column): Column = key % HeldOutMod === 0
  private[queries] def corpusSide(key: Column): Column = key % HeldOutMod =!= 0

  private val dedupEmbcos = Q("q_dedup_embcos",
    (s, dir) => Similarity.blockedCosinePairs(table(s, dir, "embeddings"), 20),
    Some(s"""WITH $duckNorm
             SELECT a.vec_id AS a, b.vec_id AS b,
                    round(list_sum(list_transform(range(1, len(a.e) + 1),
                                                  i -> a.e[i] * b.e[i]))
                          / (a.nrm * b.nrm), 4) AS cos_r
             FROM nn a JOIN nn b ON a.label = b.label AND a.vec_id < b.vec_id
             ORDER BY cos_r DESC, a, b LIMIT 20"""))

  private val annCosine = Q("q_ann_cosine",
    (s, dir) => Similarity.bruteForceTopK(table(s, dir, "embeddings"), 0L, 10),
    Some(s"""WITH $duckNorm,
             q AS (SELECT e AS qe, nrm AS qn FROM nn WHERE vec_id = 0)
             SELECT vec_id,
                    round(list_sum(list_transform(range(1, len(e) + 1),
                                                  i -> e[i] * qe[i]))
                          / (nrm * qn), 4) AS cos_r
             FROM nn, q WHERE vec_id <> 0
             ORDER BY cos_r DESC, vec_id LIMIT 10"""))

  private val annQuantized = Q("q_ann_quantized",
    (s, dir) => Similarity.quantizedTopK(table(s, dir, "embeddings"), 0L, 10),
    Some("""WITH ne AS (SELECT vec_id,
                               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                        FROM embeddings),
                 mm AS (SELECT vec_id, e,
                               list_max(list_transform(e, x -> abs(x))) AS ma
                        FROM ne),
                 qq AS (SELECT vec_id,
                               list_transform(e, x ->
                                 CAST(CAST(round(coalesce(x * 127.0 / nullif(ma, 0.0), 0.0))
                                           AS INTEGER) AS DOUBLE)) AS qv
                        FROM mm),
                 nn AS (SELECT vec_id, qv,
                               sqrt(list_sum(list_transform(qv, x -> x * x))) AS nrm
                        FROM qq),
                 q AS (SELECT qv AS qe, nrm AS qn FROM nn WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_sum(list_transform(range(1, len(qv) + 1),
                                                 i -> qv[i] * qe[i]))
                         / (nrm * qn), 4) AS cos_q
            FROM nn, q WHERE vec_id <> 0
            ORDER BY cos_q DESC, vec_id LIMIT 10"""))

  private val annIvf = Q("q_ann_ivf",
    // rides the PERSISTED label-partitioned index (r18 VERDICT #2):
    // build memoized per session, probe statically partition-pruned to
    // the query's cell; rows identical to the inline ivfTopK (oracle
    // unchanged, IvfIndexSpec pins the scanned-file set)
    (s, dir) => Similarity.ivfTopKIndexed(
      s.read.parquet(Similarity.ivfIndexPath(table(s, dir, "embeddings"))),
      0L, 10),
    Some(s"""WITH $duckNorm,
             q AS (SELECT label AS qlabel, e AS qe, nrm AS qn FROM nn WHERE vec_id = 0)
             SELECT vec_id,
                    round(list_sum(list_transform(range(1, len(e) + 1),
                                                  i -> e[i] * qe[i]))
                          / (nrm * qn), 4) AS cos_r
             FROM nn, q WHERE vec_id <> 0 AND label = qlabel
             ORDER BY cos_r DESC, vec_id LIMIT 10"""))

  /** IVF training step: per-cell element-wise centroids. */
  private val centroidsQ = Q("q_centroids",
    (s, dir) => Similarity.centroids(table(s, dir, "embeddings")),
    Some("""SELECT label, pos, round(avg(CAST(v AS DOUBLE)), 3) + 0.0 AS c FROM
              (SELECT label, unnest(embedding) AS v,
                      generate_subscripts(embedding, 1) AS pos FROM embeddings)
            GROUP BY 1, 2 ORDER BY label, pos"""))

  /** As-of join (SURVEY §7.4 extension): each purchase matched to the
    * user's latest view at-or-before it — [[graft.operators.AsOfJoin]]'s
    * union-and-carry-forward plan vs DuckDB's native ASOF JOIN. */
  private val asofJoin = Q("q_asof_join",
    (s, dir) => {
      val ev = table(s, dir, "events")
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val build = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_eid"))
      graft.operators.AsOfJoin.leftAsOf(
          probe, build, Seq("user_id"), "ts", "ts",
          Map("view_eid" -> "last_view_id"))
        .select("event_id", "last_view_id")
    },
    Some("""SELECT p.event_id, v.event_id AS last_view_id
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
              ON p.user_id = v.user_id AND v.ts <= p.ts
            ORDER BY p.event_id"""))

  /** Forward as-of: first view AFTER each purchase (next-event
    * semantics), vs DuckDB's native forward ASOF (v.ts >= p.ts). */
  private val asofForward = Q("q_asof_forward",
    (s, dir) => {
      val ev = table(s, dir, "events")
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val build = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_eid"))
      graft.operators.AsOfJoin.forwardAsOf(
          probe, build, Seq("user_id"), "ts", "ts",
          Map("view_eid" -> "next_view_id"))
        .select("event_id", "next_view_id")
    },
    Some("""SELECT p.event_id, v.event_id AS next_view_id
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
              ON p.user_id = v.user_id AND v.ts >= p.ts
            ORDER BY p.event_id"""))

  /** The salted two-phase aggregation (the hot-key lever of SURVEY §7.4)
    * under the driver's oracle: salting is result-preserving, so the
    * plain GROUP BY count is the exact twin. */
  private val saltedCount = Q("q_salted_count",
    (s, dir) => graft.plans.Skew
      .saltedCount(table(s, dir, "lineitem"), col("l_returnflag")),
    Some("""SELECT l_returnflag AS key, count(*) AS cnt
            FROM lineitem GROUP BY 1 ORDER BY key"""))

  /** One-pass data-profiling aggregate (row count, null counts, distinct
    * count, min/max, mean) — the data-quality probe every ingest runs. */
  private val profile = Q("q_profile",
    (s, dir) => table(s, dir, "customer").agg(
      count(lit(1)).as("n_rows"),
      count(col("c_name")).as("n_name_nonnull"),
      countDistinct(col("c_mktsegment")).as("n_segments"),
      min(col("c_acctbal")).as("min_bal"),
      max(col("c_acctbal")).as("max_bal"),
      round(avg(col("c_acctbal")), 4).as("avg_bal")),
    Some("""SELECT count(*) AS n_rows,
                   count(c_name) AS n_name_nonnull,
                   count(DISTINCT c_mktsegment) AS n_segments,
                   min(c_acctbal) AS min_bal,
                   max(c_acctbal) AS max_bal,
                   round(avg(c_acctbal), 4) AS avg_bal
            FROM customer"""))

  /** Time-series fill-forward (last observation carried forward): treat
    * out-of-range readings (value ≥ 100) as missing and carry the last
    * valid value per user — `last(ignoreNulls)` over one (user, time)
    * window, the gap-repair primitive of sensor/price pipelines and the
    * same carry machinery [[graft.operators.AsOfJoin]] builds on. */
  private val fillForward = Q("q_fill_forward",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "events").select(col("event_id"),
          last(when(col("value") >= 100, lit(null)).otherwise(col("value")),
            ignoreNulls = true).over(w).as("filled"))
    },
    Some("""SELECT event_id,
                   last_value(CASE WHEN value >= 100 THEN NULL ELSE value END
                              IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
            FROM events ORDER BY event_id"""))

  /** TF-IDF per document: tf (term count in doc) × ln((N+1)/(df+1)),
    * top-3 terms per doc. df comes from one distinct-count aggregate;
    * the doc-count scalar joins in as a 1-row broadcast. */
  private val tfidf = Q("q_tfidf",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val toks = docs.select(col("doc_id"),
          explode(split(lower(coalesce(col("text"), lit(""))), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      // r20 (guide §2.4): df = docs containing tok = rows of tf per tok
      // — derived FROM tf instead of a second explode + full distinct
      // exchange of the token stream (AQE stage reuse computes the tf
      // aggregate once for both consumers; same df values).
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(broadcast(df), "tok").crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 4))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("tok"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("doc_id", "tok", "tf", "tfidf", "rn")
    },
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split(lower(coalesce(text, '')), ' ')) AS tok
                          FROM documents),
                 t2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
                 tf AS (SELECT doc_id, tok, count(*) AS tf FROM t2 GROUP BY 1, 2),
                 df AS (SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM t2) GROUP BY 1),
                 n AS (SELECT count(*) AS n_docs FROM documents),
                 scored AS (SELECT tf.doc_id, tf.tok, tf.tf,
                                   round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 4) AS tfidf
                            FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n),
                 ranked AS (SELECT doc_id, tok, tf, tfidf,
                                   row_number() OVER (PARTITION BY doc_id
                                                      ORDER BY tfidf DESC, tok) AS rn
                            FROM scored)
            SELECT doc_id, tok, tf, tfidf, rn FROM ranked WHERE rn <= 3
            ORDER BY doc_id, rn"""))

  /** Token co-occurrence: top-20 within-document token pairs — the
    * inverted-index self-join shape again (never a cross product). */
  private val cooccur = Q("q_cooccur",
    (s, dir) => TextAnalysis.cooccurrence(table(s, dir, "documents"))
      .orderBy(col("cnt").desc, col("ta"), col("tb"))
      .limit(20),
    Some("""WITH t AS (SELECT DISTINCT doc_id, tok FROM
                         (SELECT doc_id, unnest(string_split(lower(coalesce(text, '')), ' ')) AS tok
                          FROM documents)
                       WHERE tok <> '')
            SELECT x.tok AS ta, y.tok AS tb, count(*) AS cnt
            FROM t x JOIN t y ON x.doc_id = y.doc_id AND x.tok < y.tok
            GROUP BY 1, 2 ORDER BY cnt DESC, ta, tb LIMIT 20"""))

  /** The HOF pair-generation strategy under the SAME oracle as q_cooccur
    * (identical output by construction; the strategies differ only in
    * plan shape — DedupScaleSpec records why "join" is the default). */
  private val cooccurHof = Q("q_cooccur_hof",
    (s, dir) => TextAnalysis
      .cooccurrence(table(s, dir, "documents"), pairStrategy = "hof")
      .orderBy(col("cnt").desc, col("ta"), col("tb"))
      .limit(20),
    Some("""WITH t AS (SELECT DISTINCT doc_id, tok FROM
                         (SELECT doc_id, unnest(string_split(lower(coalesce(text, '')), ' ')) AS tok
                          FROM documents)
                       WHERE tok <> '')
            SELECT x.tok AS ta, y.tok AS tb, count(*) AS cnt
            FROM t x JOIN t y ON x.doc_id = y.doc_id AND x.tok < y.tok
            GROUP BY 1, 2 ORDER BY cnt DESC, ta, tb LIMIT 20"""))

  /** Sessionization: gap > 30 min starts a new session per user —
    * lag + cumulative sum over one (user, ts) window; per-session row
    * counts out. The canonical event-stream operator the reference's
    * weekly cadence never needed but any events table does. */
  private val sessionize = Q("q_sessionize",
    (s, dir) => {
      val ev = table(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy("ts")
      val flagged = ev
        .withColumn("gap_s",
          unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w)))
        .withColumn("new_sess",
          when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
      flagged
        .withColumn("session_id", sum("new_sess").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("sess_start"))
    },
    Some("""WITH g AS (SELECT user_id, ts,
                              CAST(floor(epoch(ts)) AS BIGINT)
                                - CAST(floor(epoch(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts))) AS BIGINT) AS gap_s
                       FROM events),
                 f AS (SELECT user_id, ts,
                              CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END AS new_sess
                       FROM g),
                 sess AS (SELECT user_id, ts,
                                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                          FROM f)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start
            FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id"""))

  /** Connected components over the MinHash near-dup graph — exact dedup
    * clusters (vs the pipeline's greedy chains). Spark side iterates
    * min-label propagation to a fixpoint; the oracle is a recursive CTE
    * computing reachability minima. */
  private val dedupCc = Q("q_dedup_cc",
    (s, dir) => Dedup.ccLabels(table(s, dir, "documents")),
    Some(s"""WITH RECURSIVE $duckCcReach
            SELECT id, min(r) AS comp FROM reach GROUP BY id ORDER BY id"""))

  /** The capstone: full corpus-clean pipeline (quality gate → exact
    * dedup → MinHash near-dup removal → hash split) as ONE oracle-checked
    * query — every extension operator composed end-to-end. */
  private val corpusClean = Q("q_corpus_clean",
    (s, dir) => graft.extensions.CorpusPipeline
      .clean(table(s, dir, "documents")),
    Some("""WITH q AS (SELECT doc_id FROM
                         (SELECT doc_id,
                                 len(string_split(coalesce(text, ''), ' ')) AS n_tok,
                                 len(list_filter(string_split(coalesce(text, ''), ' '),
                                                 t -> t IN ('the', 'a'))) * 1.0
                                   / len(string_split(coalesce(text, ''), ' ')) AS sr
                          FROM documents)
                       WHERE n_tok BETWEEN 20 AND 70 AND round(sr, 4) <= 0.12),
                 gated AS (SELECT d.* FROM documents d JOIN q USING (doc_id)),
                 keepers AS (SELECT min(doc_id) AS doc_id FROM gated
                             GROUP BY md5(lower(coalesce(text, '')))),
                 ed AS (SELECT g.* FROM gated g JOIN keepers USING (doc_id)),
                 sh AS (SELECT DISTINCT doc_id, s FROM
                          (SELECT doc_id,
                                  unnest(list_transform(
                                    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                                    i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))) AS s
                           FROM ed)),
                 sigs AS (SELECT doc_id, sd.seed,
                                 min(md5(CAST(sd.seed AS VARCHAR) || ':' || s)) AS mh
                          FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) sd
                          GROUP BY 1, 2),
                 buckets AS (SELECT doc_id, CAST(floor(seed / 4) AS INTEGER) AS band,
                                    md5(string_agg(mh, '|' ORDER BY seed)) AS bkey
                             FROM sigs GROUP BY 1, 2),
                 dropb AS (SELECT DISTINCT y.doc_id FROM buckets x JOIN buckets y
                             ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
            SELECT ed.doc_id,
                   CASE WHEN substr(md5(CAST(ed.doc_id AS VARCHAR)), 1, 1) < 'c'
                        THEN 'train' ELSE 'val' END AS split
            FROM ed WHERE ed.doc_id NOT IN (SELECT doc_id FROM dropb)
            ORDER BY ed.doc_id"""))

  /** Capstone v2: the full pretraining gate chain. Docs with
    * doc_id % 10 == 0 play the held-out benchmark (as in
    * q_decontaminate); the rest are the corpus being cleaned. */
  private val corpusCleanFull = Q("q_corpus_clean_full",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      graft.extensions.CorpusPipeline.cleanFull(
        docs.filter(corpusSide(col("doc_id"))),
        docs.filter(heldOut(col("doc_id"))))
    },
    Some("""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
                 q AS (SELECT doc_id FROM
                         (SELECT doc_id,
                                 len(string_split(coalesce(text, ''), ' ')) AS n_tok,
                                 len(list_filter(string_split(coalesce(text, ''), ' '),
                                                 t -> t IN ('the', 'a'))) * 1.0
                                   / len(string_split(coalesce(text, ''), ' ')) AS sr
                          FROM corpus)
                       WHERE n_tok BETWEEN 20 AND 70 AND round(sr, 4) <= 0.12),
                 rep AS (SELECT doc_id FROM
                           (SELECT doc_id,
                                   CASE WHEN len(arr) < 2 THEN []
                                        ELSE list_transform(range(1, CAST(len(arr) AS INTEGER)),
                                                            i -> arr[i] || ' ' || arr[i + 1])
                                   END AS grams
                            FROM (SELECT doc_id,
                                         list_filter(string_split(lower(coalesce(text, '')), ' '),
                                                     t -> t <> '') AS arr
                                  FROM corpus))
                         WHERE len(grams) = 0
                            OR (len(grams) - len(list_distinct(grams))) * 1.0
                               / len(grams) <= 0.2),
                 gated AS (SELECT c.* FROM corpus c
                           JOIN q USING (doc_id) JOIN rep USING (doc_id)),
                 ag AS (SELECT doc_id,
                               len(list_filter(string_split(lower(coalesce(text, '')), ' '),
                                               t -> t <> '')) AS n,
                               list_filter(string_split(lower(coalesce(text, '')), ' '),
                                           t -> t <> '') AS arr
                        FROM documents),
                 grams5 AS (SELECT doc_id,
                                   unnest(CASE WHEN n < 5 THEN []
                                          ELSE list_transform(range(1, CAST(n AS INTEGER) - 3),
                                                 i -> array_to_string(arr[i : i + 4], ' '))
                                          END) AS gram
                            FROM ag),
                 bench AS (SELECT DISTINCT gram FROM grams5 WHERE doc_id % 10 = 0),
                 contaminated AS (SELECT DISTINCT g.doc_id FROM grams5 g
                                  JOIN bench USING (gram)
                                  JOIN gated USING (doc_id)),
                 decon AS (SELECT * FROM gated
                           WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
                 keepers AS (SELECT min(doc_id) AS doc_id FROM decon
                             GROUP BY md5(lower(coalesce(text, '')))),
                 ed AS (SELECT g.* FROM decon g JOIN keepers USING (doc_id)),
                 sh AS (SELECT DISTINCT doc_id, s FROM
                          (SELECT doc_id,
                                  unnest(list_transform(
                                    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                                    i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))) AS s
                           FROM ed)),
                 sigs AS (SELECT doc_id, sd.seed,
                                 min(md5(CAST(sd.seed AS VARCHAR) || ':' || s)) AS mh
                          FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) sd
                          GROUP BY 1, 2),
                 buckets AS (SELECT doc_id, CAST(floor(seed / 4) AS INTEGER) AS band,
                                    md5(string_agg(mh, '|' ORDER BY seed)) AS bkey
                             FROM sigs GROUP BY 1, 2),
                 dropb AS (SELECT DISTINCT y.doc_id FROM buckets x JOIN buckets y
                             ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
            SELECT ed.doc_id,
                   CASE WHEN substr(md5(CAST(ed.doc_id AS VARCHAR)), 1, 1) < 'c'
                        THEN 'train' ELSE 'val' END AS split
            FROM ed WHERE ed.doc_id NOT IN (SELECT doc_id FROM dropb)
            ORDER BY ed.doc_id"""))

  /** Fuzzy matching: edit-distance near-identical names under multi-key
    * blocking (brand + last name token) — the entity-resolution shape:
    * the blocked equi-join bounds candidate pairs, then the expensive
    * levenshtein runs only inside blocks (never brand-wide all-pairs,
    * which is 8M comparisons at sf0.1). */
  private val fuzzyMatch = Q("q_fuzzy_match",
    (s, dir) => {
      val p = table(s, dir, "part")
        .withColumn("noun", element_at(split(col("p_name"), " "), -1))
      p.alias("a").join(p.alias("b"),
          col("a.p_brand") === col("b.p_brand") &&
            col("a.noun") === col("b.noun") &&
            col("a.p_partkey") < col("b.p_partkey"))
        // r20 (guide §1.2 per-task work): the 3-arg levenshtein bounds
        // the DP at threshold 2 — it early-exits with -1 past the bound
        // instead of filling the full O(|a|·|b|) matrix for every
        // candidate pair, and -1 ⇔ distance > 2, so the kept set is
        // unchanged (lev only feeds this filter).
        .withColumn("lev", levenshtein(col("a.p_name"), col("b.p_name"), 2))
        .filter(col("lev") >= 0)
        .groupBy(col("a.p_brand").as("brand"))
        .agg(count(lit(1)).as("n_close"))
    },
    Some("""WITH p AS (SELECT p_partkey, p_brand, p_name,
                              string_split(p_name, ' ')[-1] AS noun
                       FROM part)
            SELECT a.p_brand AS brand, count(*) AS n_close
            FROM p a JOIN p b
              ON a.p_brand = b.p_brand AND a.noun = b.noun
                 AND a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name) <= 2
            GROUP BY 1 ORDER BY 1"""))

  private val langId = Q("q_lang_id",
    (s, dir) => TextAnalysis.languageId(table(s, dir, "documents")),
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split(lower(coalesce(text, '')), ' ')) AS tok
                          FROM documents),
                 m AS (SELECT doc_id, d.cand, count(*) AS cnt
                       FROM toks JOIN (VALUES ('the','en'),('a','en'),('data','de'),('table','de'),
                                              ('query','es'),('row','es'),('join','fr'),('merge','fr'),
                                              ('spark','zh'),('batch','zh')) AS d(tok, cand)
                         ON toks.tok = d.tok
                       GROUP BY 1, 2),
                 p AS (SELECT doc_id, cand,
                              row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, cand) AS rn
                       FROM m)
            SELECT doc.doc_id, coalesce(p.cand, 'und') AS pred
            FROM documents doc LEFT JOIN p ON p.doc_id = doc.doc_id AND p.rn = 1
            ORDER BY doc.doc_id"""))

  private val quality = Q("q_quality",
    (s, dir) => TextAnalysis.qualityScore(table(s, dir, "documents")),
    Some("""SELECT doc_id,
                   CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_tok,
                   n_chars,
                   round(list_sum(list_transform(string_split(coalesce(text, ''), ' '),
                                                 t -> length(t))) * 1.0
                         / len(string_split(coalesce(text, ''), ' ')), 4) AS avg_tok_len,
                   round(len(list_filter(string_split(coalesce(text, ''), ' '),
                                         t -> t IN ('the', 'a'))) * 1.0
                         / len(string_split(coalesce(text, ''), ' ')), 4) AS stop_ratio
            FROM documents ORDER BY doc_id"""))

  private val tokenCount = Q("q_token_count",
    (s, dir) => TextAnalysis.tokenCounts(table(s, dir, "documents")),
    Some("""SELECT doc_id,
                   CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS ws_tokens,
                   CAST(len(regexp_extract_all(coalesce(text, ''), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS BIGINT) AS re_tokens
            FROM documents ORDER BY doc_id"""))

  private val redactQ = Q("q_redact",
    (s, dir) => TextAnalysis.redact(table(s, dir, "documents")),
    Some("""SELECT doc_id,
                   regexp_replace(coalesce(text, ''), '[0-9][0-9]+', '<num>', 'g') AS redacted,
                   CAST(len(regexp_extract_all(coalesce(text, ''), '[0-9][0-9]+', 0)) AS BIGINT) AS n_redacted
            FROM documents ORDER BY doc_id"""))

  private val fingerprint = Q("q_fingerprint",
    (s, dir) => TextAnalysis.fingerprint(table(s, dir, "documents")),
    Some("""SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(
                         list_filter(string_split(lower(coalesce(text, '')), ' '), t -> t <> ''))), ' ')) AS fp
            FROM documents ORDER BY doc_id"""))

  /** Throughput twin of q_dedup_minhash: xxhash64 signatures instead of
    * md5. The raw candidate set is hash-family-specific (xxhash64 is
    * Spark-only), so the oracle-checked output is its hash-family-INVARIANT
    * subset: candidate pairs whose documents are exact content duplicates.
    * Identical text ⇒ identical shingle set ⇒ identical signature under ANY
    * hash family ⇒ all bands collide, so this subset must equal the full
    * exact-dup pair set over shingle-eligible (≥3-token) docs — which DuckDB
    * computes directly, no xxhash64 needed. The test corpus has no natural
    * exact dups below sf0.1, so the query plants them: every 5th doc is
    * unioned back in under doc_id+10,000,000 (both engines mirror the
    * union), and the fast path must recover EVERY planted pair — an
    * end-to-end check of eligibility, signature, banding, and the bucket
    * join under xxhash64 (a broken band key drops pairs and fails the row
    * count). DedupScaleSpec additionally pins md5/xxhash64 candidate parity
    * on identical docs. */
  private val dedupMinhashFast = Q("q_dedup_minhash_fast",
    (s, dir) => {
      val docs = table(s, dir, "documents").select("doc_id", "text")
      // checkpointed: four consumers below (the LSH build + two text
      // join-backs) each re-read the union otherwise (r13 scan census)
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
        .localCheckpoint()
      // share=false: the planted-dup corpus plan is unique to this query
      Dedup.minHashLsh(corpus, fastHash = true, share = false)
        .join(corpus.select(col("doc_id").as("a"), col("text").as("ta")), "a")
        .join(corpus.select(col("doc_id").as("b"), col("text").as("tb")), "b")
        .filter(col("ta") === col("tb"))
        .select("a", "b")
    },
    Some("""WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 5 = 0),
            el AS (SELECT doc_id, text FROM corpus
                   WHERE text IS NOT NULL
                     AND len(string_split(text, ' ')) >= 3)
            SELECT a.doc_id AS a, b.doc_id AS b
            FROM el a JOIN el b ON a.text = b.text AND a.doc_id < b.doc_id
            ORDER BY a, b"""))

  /** Sequence packing (concat-and-chunk): per-shard token spans and the
    * fixed-budget chunk range each document overlaps. */
  private val packChunks = Q("q_pack_chunks",
    (s, dir) => graft.extensions.Packing
      .packChunks(table(s, dir, "documents"), budget = 64),
    Some("""WITH t AS (SELECT doc_id, lang AS shard,
                              CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_tok
                       FROM documents),
                 c AS (SELECT doc_id, shard, n_tok,
                              sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok
                       FROM t)
            SELECT doc_id, shard, n_tok,
                   CAST(end_tok AS BIGINT) AS end_tok,
                   CAST(end_tok - n_tok AS BIGINT) AS start_tok,
                   CAST(floor((end_tok - n_tok) / 64) AS BIGINT) AS chunk_first,
                   CAST(floor((end_tok - 1) / 64) AS BIGINT) AS chunk_last
            FROM c ORDER BY shard, doc_id"""))

  /** The array-typed [[graft.extensions.Embeddings]] operators are the
    * library surface; the verification queries posexplode to scalar
    * (vec_id, pos, value) rows because the driver's pandas-based
    * canonicalizer can only sort/hash scalar cells (round-2 lesson). The
    * DuckDB twin zips parallel unnest(range(...))/unnest(list) columns. */
  private val embNormalize = Q("q_emb_normalize",
    // No orderBy: the driver's compare sorts rows itself, and a global
    // sort of |vecs|×dim exploded rows is pure waste at scale.
    (s, dir) => graft.extensions.Embeddings
      .l2Normalize(table(s, dir, "embeddings"))
      .select(col("vec_id"), posexplode(col("unit")).as(Seq("pos", "val"))),
    Some(s"""WITH $duckNorm,
             u AS (SELECT vec_id,
                          list_transform(e, x ->
                            round(coalesce(x / nullif(nrm, 0.0), 0.0), 6)) AS unit
                   FROM nn),
             ex AS (SELECT vec_id, unnest(range(0, len(unit))) AS pos,
                           unnest(unit) AS val
                    FROM u)
             SELECT vec_id, CAST(pos AS INTEGER) AS pos, val
             FROM ex"""))

  private val embQuantize = Q("q_emb_quantize",
    (s, dir) => graft.extensions.Embeddings
      .quantizeInt8(table(s, dir, "embeddings"))
      .select(col("vec_id"), col("scale"),
        posexplode(col("q")).as(Seq("pos", "qv"))),
    Some("""WITH ne AS (SELECT vec_id,
                               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                        FROM embeddings),
                 mm AS (SELECT vec_id, e,
                               list_max(list_transform(e, x -> abs(x))) AS ma
                        FROM ne),
                 qq AS (SELECT vec_id, round(ma, 6) AS scale,
                               list_transform(e, x ->
                                 CAST(round(coalesce(x * 127.0 / nullif(ma, 0.0), 0.0))
                                      AS INTEGER)) AS q
                        FROM mm),
                 ex AS (SELECT vec_id, scale, unnest(range(0, len(q))) AS pos,
                               unnest(q) AS qv
                        FROM qq)
            SELECT vec_id, scale, CAST(pos AS INTEGER) AS pos, qv
            FROM ex"""))

  /** Benchmark-decontamination demo: every 10th doc plays the held-out
    * eval set; the rest are the training corpus to scrub. 4-grams: long
    * enough that the flag splits the corpus at every test scale (the
    * synthetic vocabulary is so small that trigrams mark 100% of sf0.1
    * contaminated — a degenerate, unverifiable flag). */
  private val decontaminate = Q("q_decontaminate",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      TextAnalysis.decontaminate(
        docs.filter(corpusSide(col("doc_id"))),
        docs.filter(heldOut(col("doc_id"))), n = 4)
    },
    Some("""WITH g AS (SELECT doc_id,
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
                 hits AS (SELECT doc_id, count(*) AS n_shared
                          FROM train JOIN bench USING (gram) GROUP BY 1)
            SELECT d.doc_id,
                   coalesce(h.n_shared, 0) AS n_shared,
                   coalesce(h.n_shared, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
            WHERE d.doc_id % 10 <> 0
            ORDER BY d.doc_id"""))

  private val repetitionQ = Q("q_repetition",
    (s, dir) => TextAnalysis.repetition(table(s, dir, "documents")),
    Some("""WITH g AS (SELECT doc_id,
                              list_filter(string_split(lower(coalesce(text, '')), ' '),
                                          t -> t <> '') AS arr
                       FROM documents),
                 bi AS (SELECT doc_id,
                               CASE WHEN len(arr) < 2 THEN []
                                    ELSE list_transform(range(1, CAST(len(arr) AS INTEGER)),
                                                        i -> arr[i] || ' ' || arr[i + 1])
                               END AS grams
                        FROM g),
                 bs AS (SELECT doc_id,
                               CAST(len(grams) AS BIGINT) AS n_bigrams,
                               CASE WHEN len(grams) > 0
                                    THEN round((len(grams) - len(list_distinct(grams))) * 1.0
                                               / len(grams), 4)
                                    ELSE 0.0 END AS dup_bigram_ratio
                        FROM bi),
                 tok AS (SELECT doc_id, unnest(arr) AS tok FROM g),
                 tf AS (SELECT doc_id, tok, count(*) AS cnt FROM tok GROUP BY 1, 2),
                 tt AS (SELECT doc_id, round(max(cnt) * 1.0 / sum(cnt), 4) AS top_tok_ratio
                        FROM tf GROUP BY 1)
            SELECT bs.doc_id, bs.n_bigrams, bs.dup_bigram_ratio,
                   coalesce(tt.top_tok_ratio, 0.0) AS top_tok_ratio
            FROM bs LEFT JOIN tt ON bs.doc_id = tt.doc_id
            ORDER BY bs.doc_id"""))

  /** Overlapping chunks: win=32, stride=24 ⇒ 8-token overlap. The DuckDB
    * twin zips parallel unnests (positional alignment) for posexplode. */
  private val chunkOverlap = Q("q_chunk_overlap",
    (s, dir) => graft.extensions.Packing
      .slidingChunks(table(s, dir, "documents"), win = 32, stride = 24),
    Some("""WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS arr
                       FROM documents),
                 e AS (SELECT doc_id,
                              unnest(range(0, CAST(floor((len(arr) - 1) / 24) AS BIGINT) + 1))
                                AS chunk_idx,
                              unnest(list_transform(
                                range(0, CAST(floor((len(arr) - 1) / 24) AS BIGINT) + 1),
                                k -> arr[CAST(k * 24 + 1 AS INTEGER)
                                         : CAST(least(k * 24 + 32, len(arr)) AS INTEGER)]))
                                AS chunk
                       FROM t)
            SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
                   chunk_idx * 24 AS start_tok,
                   CAST(len(chunk) AS BIGINT) AS n_tok,
                   array_to_string(chunk, ' ') AS chunk_text
            FROM e ORDER BY doc_id, chunk_idx"""))

  /** Training-mix sampling: per-language keep rates over an md5 bucket of
    * doc_id; fr is deliberately absent from the mix (rate 0). */
  private val sampleStratified = Q("q_sample_stratified",
    (s, dir) => TextAnalysis.stratifiedSample(
      table(s, dir, "documents"),
      rates = Map("en" -> 0.5, "de" -> 1.0, "es" -> 0.25, "zh" -> 0.1)),
    Some("""WITH b AS (SELECT doc_id, lang,
                              CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                                   AS BIGINT) % 100 AS bucket
                       FROM documents),
                 r AS (SELECT * FROM (VALUES ('en', 50), ('de', 100), ('es', 25), ('zh', 10))
                       AS t(stratum, keep_below))
            SELECT doc_id, lang, bucket
            FROM b JOIN r ON b.lang = r.stratum
            WHERE bucket < keep_below
            ORDER BY doc_id"""))

  /** Per-language lower-quartile length cutoff: drop each language's
    * shortest quarter. */
  private val qualityCutoff = Q("q_quality_cutoff",
    (s, dir) => TextAnalysis.qualityCutoff(table(s, dir, "documents")),
    Some("""WITH c AS (SELECT lang AS stratum,
                              round(quantile_cont(n_chars, 0.25), 4) AS cutoff
                       FROM documents GROUP BY 1)
            SELECT d.doc_id, d.lang, d.n_chars, c.cutoff
            FROM documents d JOIN c ON d.lang = c.stratum
            WHERE d.n_chars >= c.cutoff
            ORDER BY d.doc_id"""))

  private val dupSpans = Q("q_dup_spans",
    (s, dir) => TextAnalysis.duplicatedSpans(table(s, dir, "documents")),
    Some("""WITH ag AS (SELECT doc_id,
                               list_filter(string_split(lower(coalesce(text, '')), ' '),
                                           t -> t <> '') AS arr
                        FROM documents),
                 w AS (SELECT doc_id,
                              unnest(CASE WHEN len(arr) < 6 THEN []
                                     ELSE list_transform(range(1, CAST(len(arr) AS INTEGER) - 4),
                                            i -> array_to_string(arr[i : i + 5], ' '))
                                     END) AS win
                       FROM ag),
                 d AS (SELECT win FROM w GROUP BY win
                       HAVING count(DISTINCT doc_id) > 1),
                 h AS (SELECT doc_id, count(*) AS n_dup
                       FROM w JOIN d USING (win) GROUP BY 1),
                 tot AS (SELECT doc_id,
                                CAST(greatest(len(arr) - 5, 0) AS BIGINT) AS n_windows
                         FROM ag)
            SELECT t.doc_id, t.n_windows,
                   coalesce(h.n_dup, 0) AS n_dup_windows,
                   CASE WHEN t.n_windows > 0
                        THEN round(coalesce(h.n_dup, 0) * 1.0 / t.n_windows, 4)
                        ELSE 0.0 END AS dup_frac
            FROM tot t LEFT JOIN h ON t.doc_id = h.doc_id
            ORDER BY t.doc_id"""))

  private val oovRate = Q("q_oov_rate",
    (s, dir) => TextAnalysis.oovRate(table(s, dir, "documents")),
    Some("""WITH toks AS (SELECT unnest(list_filter(
                                   string_split(lower(coalesce(text, '')), ' '),
                                   t -> t <> '')) AS tok
                          FROM documents),
                 v AS (SELECT tok FROM toks GROUP BY tok
                       ORDER BY count(*) DESC, tok LIMIT 25),
                 vocab AS (SELECT list(tok) AS vs FROM v),
                 p AS (SELECT doc_id,
                              list_filter(string_split(lower(coalesce(text, '')), ' '),
                                          t -> t <> '') AS arr
                       FROM documents)
            SELECT doc_id,
                   CAST(len(arr) AS BIGINT) AS n_tok,
                   CAST(len(list_filter(arr, t -> NOT list_contains(vs, t))) AS BIGINT) AS n_oov,
                   CASE WHEN len(arr) > 0
                        THEN round(len(list_filter(arr, t -> NOT list_contains(vs, t))) * 1.0
                                   / len(arr), 4)
                        ELSE 0.0 END AS oov_ratio
            FROM p CROSS JOIN vocab
            ORDER BY doc_id"""))

  private val embLsh = Q("q_emb_lsh",
    (s, dir) => graft.extensions.Embeddings
      .hyperplaneLsh(table(s, dir, "embeddings")),
    Some("""WITH ne AS (SELECT vec_id,
                               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                        FROM embeddings)
            SELECT vec_id,
                   CAST(list_sum(list_transform(range(0, 16), i ->
                     CASE WHEN list_sum(list_transform(range(0, len(e)), j ->
                                  e[CAST(j AS INTEGER) + 1] *
                                  CASE WHEN substr(md5(i || ':' || j), 1, 1) < '8'
                                       THEN 1.0 ELSE -1.0 END)) > 0
                          THEN CAST(1 AS BIGINT) << CAST(i AS INTEGER)
                          ELSE 0 END)) AS BIGINT) AS bucket
            FROM ne ORDER BY vec_id"""))

  val all: Seq[Q] = Seq(
    dedupExact, dedupMinhash, dedupMinhashFast, dedupIncremental,
    dedupSimhash, dedupSimhashPairs,
    dedupNgram, dedupNgramPruned, dedupNgramEncoded,
    dedupEmbcos, annCosine, annQuantized, annIvf, centroidsQ,
    asofJoin, asofForward, saltedCount, profile, fillForward,
    tfidf, cooccur, cooccurHof, sessionize, corpusClean, corpusCleanFull,
    dedupCc, fuzzyMatch,
    langId, quality, tokenCount, fingerprint, redactQ,
    decontaminate, repetitionQ, chunkOverlap, sampleStratified,
    qualityCutoff, oovRate, dupSpans,
    packChunks, embNormalize, embQuantize, embLsh)
}
