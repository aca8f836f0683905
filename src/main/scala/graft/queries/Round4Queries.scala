package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.extensions.{Dedup, Membership, TextAnalysis}
import graft.operators.RangeJoin

/** Round-4 surface: binned range join, post-dedup canonical selection,
  * the MinHash accuracy contract, Bloom-prefiltered membership, bigram-LM
  * quality scoring, Zipf head stats, unpivot, distribution windows, and
  * text canonicalization. Same contract as every other row: md5-based
  * hashing and double-exact arithmetic so each query carries a bitwise
  * DuckDB oracle. */
object Round4Queries {

  /** Binned range join (operators/RangeJoin): 25 price brackets derived
    * from `nation` so the oracle can rebuild them; the physical plan is a
    * HASH join on the bin key, not the BroadcastNestedLoopJoin a plain
    * theta join plans (BinnedRangeJoinSpec pins the plan shape). */
  private val rangeJoinBinned = Q("q_range_join_binned",
    (s, dir) => {
      val iv = table(s, dir, "nation").select(
        (lit(900.0) + col("n_nationkey") * 4.0).as("lo"),
        (lit(904.0) + col("n_nationkey") * 4.0).as("hi"),
        col("n_name").as("bracket"))
      RangeJoin.pointInInterval(table(s, dir, "part"), "p_retailprice", iv, 2.0)
        .groupBy("bracket")
        .agg(count(lit(1)).as("n"),
          round(min("p_retailprice"), 2).as("min_price"),
          round(max("p_retailprice"), 2).as("max_price"))
    },
    Some("""WITH iv AS (SELECT 900 + n_nationkey * 4.0 AS lo,
                               904 + n_nationkey * 4.0 AS hi,
                               n_name AS bracket
                        FROM nation)
            SELECT bracket, count(*) AS n,
                   round(min(p_retailprice), 2) AS min_price,
                   round(max(p_retailprice), 2) AS max_price
            FROM part JOIN iv ON p_retailprice >= lo AND p_retailprice < hi
            GROUP BY 1 ORDER BY 1"""))

  /** Canonical-survivor selection per SimHash cluster (Dedup.keepCanonical). */
  private val dedupKeep = Q("q_dedup_keep",
    (s, dir) => Dedup.keepCanonical(table(s, dir, "documents")),
    Some(s"""WITH ${ExtensionQueries.simhashCtes},
             j AS (SELECT d.doc_id, d.n_chars,
                          coalesce(s.simhash, d.doc_id) AS cluster
                   FROM documents d LEFT JOIN sh s USING (doc_id))
             SELECT doc_id, cluster,
                    first_value(doc_id) OVER
                      (PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS canonical_id,
                    doc_id = first_value(doc_id) OVER
                      (PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS kept
             FROM j ORDER BY doc_id"""))

  /** MinHash estimate vs exact Jaccard on the candidate pairs
    * (Dedup.jaccardEstimate) — the sketch-accuracy contract. */
  private val minhashEst = Q("q_minhash_est",
    (s, dir) => Dedup.jaccardEstimate(table(s, dir, "documents")),
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
                             FROM sigs GROUP BY 1, 2),
                 pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                           FROM buckets x JOIN buckets y
                             ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
                 sigl AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM sigs GROUP BY 1),
                 sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
                 inter AS (SELECT p.a, p.b, count(*) AS i
                           FROM pairs p
                             JOIN sh x ON x.doc_id = p.a
                             JOIN sh y ON y.doc_id = p.b AND y.s = x.s
                           GROUP BY 1, 2)
            SELECT p.a, p.b,
                   round(len(list_filter(range(1, 9), i -> sa.sig[i] = sb.sig[i])) / 8.0, 4) AS est_jac,
                   round(i * 1.0 / (sza.n + szb.n - i), 4) AS exact_jac
            FROM pairs p
              JOIN sigl sa ON sa.doc_id = p.a
              JOIN sigl sb ON sb.doc_id = p.b
              JOIN sz sza ON sza.doc_id = p.a
              JOIN sz szb ON szb.doc_id = p.b
              JOIN inter ON inter.a = p.a AND inter.b = p.b
            ORDER BY p.a, p.b"""))

  /** Bloom-prefiltered shingle membership against a reference slice
    * (docs with doc_id % 5 == 0 play the reference corpus): per
    * remaining doc, how many of its 3-gram shingles appear in the
    * reference set. The bloom filter prunes the shuffle; the exact
    * semi-join removes false positives, so the result equals the plain
    * semi-join the oracle runs. */
  private val bloomJoin = Q("q_bloom_join",
    (s, dir) => {
      // ONE shingle pass over the whole table (the shared memoized frame
      // every dedup query reuses), split by doc_id afterwards — never two
      // scan+explode+distinct pipelines over disjoint filters.
      val sh = Dedup.shingles(table(s, dir, "documents"))
      val ref = sh.filter(col("doc_id") % 5 === 0).select("s").distinct()
      val big = sh.filter(col("doc_id") % 5 =!= 0)
      Membership.bloomSemiJoin(big, ref, "s", expectedItems = 1L << 20)
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    },
    Some("""WITH sh AS (SELECT DISTINCT doc_id, s FROM
                          (SELECT doc_id,
                                  unnest(list_transform(
                                    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                                    i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))) AS s
                           FROM documents)),
                 ref AS (SELECT DISTINCT s FROM sh WHERE doc_id % 5 = 0),
                 big AS (SELECT doc_id, s FROM sh WHERE doc_id % 5 <> 0)
            SELECT doc_id, count(*) AS n_shared
            FROM big JOIN ref USING (s)
            GROUP BY 1 ORDER BY 1"""))

  /** Bigram-LM quality score (TextAnalysis.bigramLmScore). */
  private val bigramLm = Q("q_bigram_lm",
    (s, dir) => TextAnalysis.bigramLmScore(table(s, dir, "documents")),
    Some("""WITH d AS (SELECT doc_id,
                              list_filter(string_split(lower(coalesce(text, '')), ' '),
                                          t -> t <> '') AS arr
                       FROM documents),
                 bgs AS (SELECT doc_id,
                                unnest(list_transform(range(1, CAST(len(arr) AS INTEGER)),
                                  i -> array_to_string(list_slice(arr, i, i + 1), ' '))) AS bg
                         FROM d),
                 model AS (SELECT bg, count(*) AS c_bg FROM bgs GROUP BY 1),
                 ctx AS (SELECT string_split(bg, ' ')[1] AS w1, sum(c_bg) AS c_w1
                         FROM model GROUP BY 1),
                 v AS (SELECT count(DISTINCT tok) AS v FROM
                         (SELECT unnest(arr) AS tok FROM d)),
                 sc AS (SELECT doc_id, count(*) AS n_bigrams,
                               round(avg(log2((c_bg + 0.5) / (c_w1 + 0.5 * v))), 4) AS avg_log2_p
                        FROM bgs JOIN model USING (bg)
                          JOIN ctx ON string_split(bg, ' ')[1] = ctx.w1
                          CROSS JOIN v
                        GROUP BY 1)
            SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams, sc.avg_log2_p
            FROM d LEFT JOIN sc USING (doc_id)
            ORDER BY doc_id"""))

  /** Zipf head profile (TextAnalysis.zipfStats). */
  private val zipf = Q("q_zipf",
    (s, dir) => TextAnalysis.zipfStats(table(s, dir, "documents"), topK = 50)
      .withColumn("rank", col("rank").cast("long")),
    Some("""WITH c AS (SELECT tok, count(*) AS cnt FROM
                         (SELECT unnest(list_filter(
                                   string_split(lower(coalesce(text, '')), ' '),
                                   t -> t <> '')) AS tok
                          FROM documents)
                       GROUP BY 1),
                 r AS (SELECT tok, cnt,
                              row_number() OVER (ORDER BY cnt DESC, tok) AS rank,
                              sum(cnt) OVER (ORDER BY cnt DESC, tok
                                             ROWS UNBOUNDED PRECEDING) AS cum,
                              sum(cnt) OVER () AS total
                       FROM c)
            SELECT rank, tok AS token, cnt,
                   round(cum * 1.0 / total, 4) AS cum_share
            FROM r WHERE rank <= 50 ORDER BY rank"""))

  /** Unpivot / melt (Dataset.unpivot — §2 reshape surface). */
  private val unpivot = Q("q_unpivot",
    (s, dir) => table(s, dir, "part")
      .select(col("p_partkey"),
        col("p_size").cast("double").as("p_size"),
        col("p_retailprice").cast("double").as("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "metric", "val"),
    Some("""SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
            UNION ALL
            SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE) FROM part
            ORDER BY p_partkey, metric"""))

  /** Distribution windows: ntile quartiles, percent_rank, cume_dist over
    * a unique total order (ties broken by key — ntile over a non-unique
    * order is nondeterministic). Global-order windows single-task by
    * construction; the partitioned forms are exercised by q_rank_window /
    * q_pct_window. */
  private val windowStats = Q("q_window_stats",
    (s, dir) => {
      val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
      table(s, dir, "orders").select(col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cum_dist"))
    },
    Some("""SELECT o_orderkey,
                   CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                   round(percent_rank() OVER w, 4) AS pct_rank,
                   round(cume_dist() OVER w, 4) AS cum_dist
            FROM orders
            WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
            ORDER BY o_orderkey"""))

  /** Text canonicalization (TextAnalysis.normalizeText). */
  private val normalizeText = Q("q_normalize_text",
    (s, dir) => TextAnalysis.normalizeText(table(s, dir, "documents")),
    Some("""WITH n AS (SELECT doc_id,
                              trim(regexp_replace(
                                regexp_replace(lower(coalesce(text, '')),
                                               '[^a-z0-9 ]', ' ', 'g'),
                                ' {2,}', ' ', 'g')) AS norm
                       FROM documents)
            SELECT doc_id, norm, CAST(length(norm) AS BIGINT) AS n_chars_norm
            FROM n ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(
    rangeJoinBinned, dedupKeep, minhashEst, bloomJoin,
    bigramLm, zipf, unpivot, windowStats, normalizeText)
}
