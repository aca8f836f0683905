package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** SQL entry surface — the same engine through `spark.sql`.
  *
  * The reference's consumers are notebook users (001_….ipynb runs pandas
  * over CSV; its successors would type SQL), so every relational operator
  * here must be reachable without touching the DataFrame API. The parquet
  * tables register as temp views and the headline queries run as plain
  * ANSI SQL text — same Catalyst plans as the DataFrame formulations
  * (SqlSurfaceSpec pins result equality and plan shape for the flagship).
  *
  * Each `q_*_sql` twin keeps the DuckDB oracle of its DataFrame original,
  * so the driver verifies the SQL path end-to-end too. */
object SqlQueries {

  /** Register every harness table as a temp view on this session.
    * Idempotent; frames are memoized by [[graft.Tables]], so re-running
    * per query costs a map lookup + catalog update, not a re-list. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }

  /** SQL text of the flagship: per-language top-10 tokens with
    * pct-of-total (same shape as CoreQueries q_flagship). */
  val flagshipSql: String =
    """WITH toks AS (SELECT lang,
                            explode(split(coalesce(text, ''), ' ')) AS token
                     FROM documents),
            c AS (SELECT lang, token, count(1) AS cnt
                  FROM toks WHERE token <> '' GROUP BY lang, token),
            p AS (SELECT lang, token, cnt,
                         round(cnt * 100.0D / sum(cnt) OVER (PARTITION BY lang), 4) AS pct,
                         row_number() OVER (PARTITION BY lang
                                            ORDER BY cnt DESC, token) AS rn
                  FROM c)
       SELECT lang, token, cnt, pct, rn FROM p WHERE rn <= 10"""

  private def sqlQ(name: String, text: String, oracle: String): Q =
    Q(name,
      (s, dir) => { registerViews(s, dir); s.sql(text) },
      Some(oracle))

  private val flagshipSqlQ = sqlQ("q_flagship_sql", flagshipSql,
    """WITH c AS (SELECT lang, token, count(*) AS cnt FROM
                    (SELECT lang, unnest(string_split(coalesce(text, ''), ' ')) AS token
                     FROM documents)
                  WHERE token <> '' GROUP BY lang, token),
            p AS (SELECT lang, token, cnt,
                         round(cnt * 100.0 / sum(cnt) OVER (PARTITION BY lang), 4) AS pct,
                         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rn
                  FROM c)
       SELECT lang, token, cnt, pct, rn FROM p WHERE rn <= 10
       ORDER BY lang, rn""")

  private val totalPerYearSqlQ = sqlQ("q_total_per_year_sql",
    """SELECT CAST(year(o_orderdate) AS INT) AS yr,
              count(1) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM orders GROUP BY 1""",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
              count(*) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM orders GROUP BY 1 ORDER BY 1""")

  private val pctWindowSqlQ = sqlQ("q_pct_window_sql",
    """WITH b AS (SELECT CAST(year(o_orderdate) AS INT) AS yr,
                         o_orderpriority AS pri, count(1) AS cnt
                  FROM orders GROUP BY 1, 2)
       SELECT yr, pri, cnt,
              round(cnt * 100.0D / sum(cnt) OVER (PARTITION BY yr), 4) AS pct
       FROM b""",
    """WITH b AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
                         o_orderpriority AS pri, count(*) AS cnt
                  FROM orders GROUP BY 1, 2)
       SELECT yr, pri, cnt,
              round(cnt * 100.0 / sum(cnt) OVER (PARTITION BY yr), 4) AS pct
       FROM b ORDER BY yr, pri""")

  val all: Seq[Q] = Seq(flagshipSqlQ, totalPerYearSqlQ, pctWindowSqlQ)
}
