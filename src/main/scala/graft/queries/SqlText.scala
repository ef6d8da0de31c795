package graft.queries

import graft.{QueryDef, QueryModule, Tables}

/** SQL-TEXT twins of the flagship query shapes (VERDICT r10 item 4):
  * every query here goes through `spark.sql(text)` — Spark's parser /
  * analyzer path — where the DataFrame suite exercises the DSL. The
  * shapes mirror graded DSL queries (star join, rollup, window rank,
  * set ops, EXISTS, sessionize, CTE reuse, inline VALUES, pagination)
  * but are written as fresh SQL, each with its own DuckDB oracle.
  * Money follows the integer-cents contract everywhere: Spark
  * accumulates DECIMAL(38,0) cents (a BIGINT window/group sum would
  * wrap where DuckDB's HUGEINT stays exact), both engines cast the
  * exact integer to DOUBLE before the /100.0.
  *
  * Plan shapes are the SAME physical plans as the DSL twins (the
  * parser is sugar): the star join broadcasts dims, the rollup is one
  * Expand + hash aggregate, sessionize is the lag/cumsum rewrite —
  * PlanAuditSpec's audits run over these rows like any other.
  */
object SqlText extends QueryModule {

  /** Spark-side exact-cents sum fragment (text twin of centsSum). */
  private def cents(x: String): String =
    s"CAST(sum(CAST(round(($x) * 100) AS DECIMAL(38,0))) AS DOUBLE) / 100.0"

  private def reg(s: org.apache.spark.sql.SparkSession, d: String,
      names: String*): Unit =
    names.foreach {
      case "lineitem" => Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sqt")
      case "orders"   => Tables.orders(s, d).createOrReplaceTempView("orders_sqt")
      case "customer" => Tables.customer(s, d).createOrReplaceTempView("customer_sqt")
      case "nation"   => Tables.nation(s, d).createOrReplaceTempView("nation_sqt")
      case "region"   => Tables.region(s, d).createOrReplaceTempView("region_sqt")
      case "events"   => Tables.events(s, d).createOrReplaceTempView("events_sqt")
      case "documents" => Tables.documents(s, d).createOrReplaceTempView("documents_sqt")
      case "embeddings" => Tables.embeddings(s, d).createOrReplaceTempView("embeddings_sqt")
      case other => throw new IllegalArgumentException(other)
    }

  /** Five-table star join in SQL text: fact → orders → customer →
    * nation → region with a selective region filter. Same physical
    * shape as q_join_star (dims broadcast, one fact shuffle).
    */
  val sqlStarJoin = QueryDef(
    "q_sql_star_join",
    (s, d) => {
      reg(s, d, "lineitem", "orders", "customer", "nation", "region")
      s.sql(s"""
        SELECT r_name AS region, o_orderpriority,
               count(*) AS n_items,
               ${cents("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem_sqt
        JOIN orders_sqt   ON l_orderkey = o_orderkey
        JOIN customer_sqt ON o_custkey = c_custkey
        JOIN nation_sqt   ON c_nationkey = n_nationkey
        JOIN region_sqt   ON n_regionkey = r_regionkey
        WHERE r_name IN ('AMERICA', 'AFRICA') AND o_orderstatus = 'F'
        GROUP BY r_name, o_orderpriority
        ORDER BY region, o_orderpriority
      """)
    },
    Some("""
      SELECT r_name AS region, o_orderpriority,
             count(*) AS n_items,
             sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT))
               / 100.0 AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name IN ('AMERICA', 'AFRICA') AND o_orderstatus = 'F'
      GROUP BY r_name, o_orderpriority
      ORDER BY region, o_orderpriority
    """))

  /** GROUP BY ROLLUP in SQL text with GROUPING() disambiguation (a
    * NULL group value vs a rollup subtotal are different things).
    */
  val sqlRollup = QueryDef(
    "q_sql_rollup",
    (s, d) => {
      reg(s, d, "lineitem")
      s.sql(s"""
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
               coalesce(l_linestatus, 'ALL') AS status,
               CAST(grouping(l_returnflag) + grouping(l_linestatus) AS BIGINT)
                 AS subtotal_level,
               count(*) AS n_items,
               ${cents("l_extendedprice")} AS revenue
        FROM lineitem_sqt
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY flag, status
      """)
    },
    Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS flag,
             coalesce(l_linestatus, 'ALL') AS status,
             CAST(grouping(l_returnflag) + grouping(l_linestatus) AS BIGINT)
               AS subtotal_level,
             count(*) AS n_items,
             sum(CAST(round((l_extendedprice) * 100) AS BIGINT)) / 100.0 AS revenue
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY flag, status
    """))

  /** Ranking functions through a named WINDOW in SQL text, with the
    * standard subquery-filter idiom for top-k per group (rank ≤ 3
    * keeps ties; ntile graded alongside).
    */
  val sqlWindowRank = QueryDef(
    "q_sql_window_rank",
    (s, d) => {
      reg(s, d, "orders")
      s.sql("""
        SELECT o_orderpriority, o_orderkey, o_totalprice, rnk, drnk, quartile
        FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 CAST(rank() OVER w AS BIGINT) AS rnk,
                 CAST(dense_rank() OVER w AS BIGINT) AS drnk,
                 CAST(ntile(4) OVER w AS BIGINT) AS quartile
          FROM orders_sqt
          WINDOW w AS (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey))
        WHERE rnk <= 3
        ORDER BY o_orderpriority, rnk, o_orderkey
      """)
    },
    Some("""
      SELECT o_orderpriority, o_orderkey, o_totalprice, rnk, drnk, quartile
      FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ntile(4) OVER w AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rnk <= 3
      ORDER BY o_orderpriority, rnk, o_orderkey
    """))

  /** Chained set operations in SQL text (INTERSECT inside parens, then
    * EXCEPT): urgent∩high buyers minus customers with a P order.
    */
  val sqlSetOps = QueryDef(
    "q_sql_setops",
    (s, d) => {
      reg(s, d, "orders")
      s.sql("""
        (SELECT o_custkey AS custkey FROM orders_sqt
         WHERE o_orderpriority = '1-URGENT'
         INTERSECT
         SELECT o_custkey FROM orders_sqt
         WHERE o_orderpriority = '2-HIGH')
        EXCEPT
        SELECT o_custkey FROM orders_sqt WHERE o_orderstatus = 'P'
        ORDER BY custkey
      """)
    },
    Some("""
      (SELECT o_custkey AS custkey FROM orders
       WHERE o_orderpriority = '1-URGENT'
       INTERSECT
       SELECT o_custkey FROM orders
       WHERE o_orderpriority = '2-HIGH')
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      ORDER BY custkey
    """))

  /** Correlated EXISTS + NOT EXISTS in SQL text (plans as semi/anti
    * joins — the same physical shape PlanAuditSpec pins for the DSL
    * semi/anti rows).
    */
  val sqlExists = QueryDef(
    "q_sql_exists",
    (s, d) => {
      reg(s, d, "orders", "customer")
      s.sql("""
        SELECT c_custkey, c_name
        FROM customer_sqt c
        WHERE EXISTS (SELECT 1 FROM orders_sqt o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders_sqt o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'P')
        ORDER BY c_custkey
      """)
    },
    Some("""
      SELECT c_custkey, c_name
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderstatus = 'P')
      ORDER BY c_custkey
    """))

  /** The 30-minute-gap sessionize rewrite in pure SQL text (lag →
    * new-session flag → running sum), grading the parser on the
    * WINDOW-in-CTE chain every event pipeline writes. Same lag/cumsum
    * rewrite and same single user_id shuffle as q_sessionize_lag.
    */
  val sqlSessionize = QueryDef(
    "q_sql_sessionize",
    (s, d) => {
      reg(s, d, "events")
      s.sql("""
        WITH stamped AS (
          SELECT user_id, event_id, unix_micros(ts) AS us
          FROM events_sqt),
        flagged AS (
          SELECT user_id, event_id, us,
                 CASE WHEN lag(us) OVER w IS NULL
                           OR us - lag(us) OVER w >= 1800000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM stamped
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        sess AS (
          SELECT user_id, us,
                 CAST(sum(new_sess) OVER (PARTITION BY user_id
                   ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS session_id
          FROM flagged)
        SELECT user_id, session_id, count(*) AS n_events,
               max(us) - min(us) AS duration_us
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
      """)
    },
    Some("""
      WITH stamped AS (
        SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events),
      flagged AS (
        SELECT user_id, event_id, us,
               CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w >= 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM stamped
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      sess AS (
        SELECT user_id, us,
               CAST(sum(new_sess) OVER (PARTITION BY user_id
                 ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id, count(*) AS n_events,
             max(us) - min(us) AS duration_us
      FROM sess
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id
    """))

  /** A CTE consumed by TWO downstream references (the rank and the
    * share-of-total both read nat_rev) — the parser/analyzer CTE
    * dedup surface. Rank runs on |nations| ≤ 25 rows (bounded global
    * window, allowlisted); the 1-row total cross-joins back
    * (tf_idf-pattern BNL).
    */
  val sqlCte = QueryDef(
    "q_sql_cte",
    (s, d) => {
      reg(s, d, "orders", "customer", "nation")
      s.sql("""
        WITH nat_rev AS (
          SELECT n_name,
                 sum(CAST(round(o_totalprice * 100) AS DECIMAL(38,0))) AS rev_cents
          FROM orders_sqt
          JOIN customer_sqt ON o_custkey = c_custkey
          JOIN nation_sqt   ON c_nationkey = n_nationkey
          GROUP BY n_name),
        tot AS (SELECT sum(rev_cents) AS total_cents FROM nat_rev)
        SELECT n_name,
               CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
               CAST(rank() OVER (ORDER BY rev_cents DESC, n_name) AS BIGINT) AS rnk,
               CAST(CAST(rev_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
                 AS FLOAT) AS share
        FROM nat_rev CROSS JOIN tot
        ORDER BY rnk, n_name
      """)
    },
    Some("""
      WITH nat_rev AS (
        SELECT n_name,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name),
      tot AS (SELECT sum(rev_cents) AS total_cents FROM nat_rev)
      SELECT n_name,
             CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
             rank() OVER (ORDER BY rev_cents DESC, n_name) AS rnk,
             CAST(CAST(rev_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
               AS FLOAT) AS share
      FROM nat_rev CROSS JOIN tot
      ORDER BY rnk, n_name
    """))

  /** Inline VALUES as a join relation in SQL text: a literal
    * priority→tier mapping joined onto the fact (the hand-written
    * enum-dim idiom). Broadcasts trivially.
    */
  val sqlValues = QueryDef(
    "q_sql_values",
    (s, d) => {
      reg(s, d, "orders")
      s.sql(s"""
        SELECT tier, count(*) AS n_orders,
               ${cents("o_totalprice")} AS tier_revenue
        FROM orders_sqt
        JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
                     ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
                     ('5-LOW', 'cold')) AS t(pri, tier)
          ON o_orderpriority = pri
        GROUP BY tier
        ORDER BY tier
      """)
    },
    Some("""
      SELECT tier, count(*) AS n_orders,
             sum(CAST(round((o_totalprice) * 100) AS BIGINT)) / 100.0
               AS tier_revenue
      FROM orders
      JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
                   ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
                   ('5-LOW', 'cold')) t(pri, tier)
        ON o_orderpriority = pri
      GROUP BY tier
      ORDER BY tier
    """))

  /** LIMIT/OFFSET pagination in SQL text over a total order (price
    * desc, orderkey tiebreak) — page 3 of 20. Plans as a global
    * TakeOrdered, not a full sort.
    */
  val sqlLimitOffset = QueryDef(
    "q_sql_limit_offset",
    (s, d) => {
      reg(s, d, "orders")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_sqt
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 40
      """)
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 20 OFFSET 40
    """))

  /** MinHash/LSH near-dup dedup in SQL TEXT (r13 — the §2.10 flagship
    * through the parser path). Since r17 (VERDICT r16 item 4) the SQL
    * reads the WARMED band-signature and shingle artifacts as temp
    * views — the same once-paid ingest artifacts the DSL twin reads —
    * and keeps the parser for the LSH logic itself: bucket cap 2..10,
    * candidate self-join, Jaccard verify. Same oracle as
    * q_dedup_minhash, so the hash match proves the view-served parser
    * path ≡ the DSL ≡ the DuckDB full recompute. Re-deriving the md5
    * banding through the parser every run cost the sf26 bench 104 s
    * vs the DSL twin's 13 s for the identical answer; the
    * full-recompute SQL text stays pinned (hash-identical at
    * sf0.001) in SqlSurfaceSpec via [[minhashFullRecomputeSql]], so
    * parser coverage of the md5/banding expressions is kept.
    */
  private[graft] val minhashFullRecomputeSql = """
    WITH tok AS (
      SELECT doc_id, filter(split(text, ' '), t -> t != '') AS toks
      FROM documents_sqt),
    sh AS (
      SELECT doc_id,
             CASE WHEN size(toks) >= 3
               THEN array_distinct(transform(sequence(0, size(toks) - 3),
                      i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])))
               ELSE CAST(array() AS ARRAY<STRING>) END AS shingles
      FROM tok),
    sig AS (
      SELECT doc_id, band,
             array_min(transform(hs, h -> substr(h, band * 8 + 1, 8))) AS sig
      FROM (SELECT doc_id,
                   transform(shingles, x -> concat(md5(x), md5(concat('x', x)))) AS hs
            FROM sh)
      LATERAL VIEW explode(sequence(0, 7)) b AS band),
    ok AS (
      SELECT band, sig FROM sig
      GROUP BY band, sig HAVING count(*) BETWEEN 2 AND 10),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM sig a
      JOIN ok USING (band, sig)
      JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
    verified AS (
      SELECT doc1, doc2,
             round(CAST(size(array_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
                   / size(array_union(s1.shingles, s2.shingles)), 4) AS jaccard
      FROM cand
      JOIN sh s1 ON doc1 = s1.doc_id
      JOIN sh s2 ON doc2 = s2.doc_id)
    SELECT doc1, doc2, jaccard FROM verified
    WHERE jaccard >= 0.1
    ORDER BY doc1, doc2
  """

  val sqlMinhashDedup = QueryDef(
    "q_sql_minhash_dedup",
    (s, d) => {
      Dedup.registerMinhashViews(s, d)
      s.sql("""
        WITH ok AS (
          SELECT band, sig FROM minhash_sig_sqt
          GROUP BY band, sig HAVING count(*) BETWEEN 2 AND 10),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
          FROM minhash_sig_sqt a
          JOIN ok USING (band, sig)
          JOIN minhash_sig_sqt b
            ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        verified AS (
          -- |union| = |a| + |b| - |intersect| for the distinct shingle
          -- sets: one per-pair set pass instead of two (the repeated
          -- count CSEs in codegen); the set is the artifact's 128-bit
          -- hashed form (sorted hash-pair arrays since r18 — see
          -- Dedup.shingleTableWarm for the collision budget) and the
          -- intersection count is the registered merge kernel —
          -- severalfold cheaper than string set ops on the 1.5M-pair
          -- verify, and the oracle still computes over the strings
          SELECT doc1, doc2,
                 round(CAST(sorted_intersect_count(s1.shash, s2.shash) AS DOUBLE)
                       / (size(s1.shash) + size(s2.shash)
                          - sorted_intersect_count(s1.shash, s2.shash)), 4) AS jaccard
          FROM cand
          JOIN minhash_sh_sqt s1 ON doc1 = s1.doc_id
          JOIN minhash_sh_sqt s2 ON doc2 = s2.doc_id)
        SELECT doc1, doc2, jaccard FROM verified
        WHERE jaccard >= 0.1
        ORDER BY doc1, doc2
      """)
    },
    Some(s"""
      WITH ${Dedup.minhashVerifiedCte}
      SELECT doc1, doc2, jaccard FROM verified
      ORDER BY doc1, doc2
    """))

  /** Brute-force cosine top-k in SQL TEXT: the registered native
    * cosine_sim expression (codegen'd, double accumulation in element
    * order) called from the parser path over the embeddings
    * cross-join. Same oracle as q_cosine_topk.
    */
  val sqlCosineTopk = QueryDef(
    "q_sql_cosine_topk",
    (s, d) => {
      graft.functions.expressions.CosineSimilarity.register(s)
      reg(s, d, "embeddings")
      s.sql("""
        SELECT query_id, neighbor_id, rank, round(cos, 4) AS cosine
        FROM (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 cosine_sim(a.embedding, b.embedding) AS cos,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY cosine_sim(a.embedding, b.embedding) DESC, b.vec_id)
                   AS rank
          FROM embeddings_sqt a JOIN embeddings_sqt b ON a.vec_id <> b.vec_id
          WHERE a.vec_id < 3)
        WHERE rank <= 5
        ORDER BY query_id, rank
      """).selectExpr("query_id", "neighbor_id", "CAST(rank AS BIGINT) AS rank",
        "cosine")
    },
    Some(s"""
      SELECT query_id, neighbor_id, rank, round(cos, 4) AS cosine
      FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, ${Similarity.duckCos} AS cos,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY ${Similarity.duckCos} DESC, b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 3)
      WHERE rank <= 5
      ORDER BY query_id, rank
    """))

  /** TF-IDF top-3 terms per probe doc in SQL TEXT: term frequency,
    * document frequency, and the lazy one-row corpus count as plain
    * CTEs through the parser. Same oracle as q_tf_idf.
    */
  val sqlTfIdf = QueryDef(
    "q_sql_tf_idf",
    (s, d) => {
      reg(s, d, "documents")
      s.sql("""
        WITH toks AS (
          SELECT doc_id, explode(filter(split(text, ' '), t -> t != '')) AS token
          FROM documents_sqt),
        tf AS (
          SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
        df AS (
          SELECT token, count(*) AS df
          FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents_sqt),
        scored AS (
          SELECT doc_id, token, round(tf * ln(n_docs / df), 6) AS tfidf
          FROM tf JOIN df USING (token) CROSS JOIN n
          WHERE doc_id < 10)
        SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, tfidf
        FROM (
          SELECT doc_id, token, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, token) AS rank
          FROM scored)
        WHERE rank <= 3
        ORDER BY doc_id, rank
      """)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        FROM documents),
      tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
      df AS (
        SELECT token, count(*) AS df
        FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT doc_id, token,
               round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n
        WHERE doc_id < 10)
      SELECT doc_id, rank, token, tfidf
      FROM (
        SELECT doc_id, token, tfidf,
               row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
        FROM scored)
      WHERE rank <= 3
      ORDER BY doc_id, rank
    """))

  /** Duplicated-span removal in SQL TEXT (twin of q_dedup_spans, same
    * oracle): positional 5-gram windows via transform-over-sequence +
    * posexplode through the parser — no registered native functions,
    * the whole pipeline is portable higher-order SQL.
    */
  val sqlDedupSpans = QueryDef(
    "q_sql_dedup_spans",
    (s, d) => {
      reg(s, d, "documents")
      s.sql("""
        WITH tok AS (
          SELECT doc_id, filter(split(text, ' '), t -> t != '') AS toks
          FROM documents_sqt),
        sp AS (
          SELECT doc_id, pos + 1 AS start, sh
          FROM (SELECT doc_id,
                       CASE WHEN size(toks) >= 5
                         THEN transform(sequence(0, size(toks) - 5),
                                i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2],
                                            ' ', toks[i + 3], ' ', toks[i + 4]))
                         ELSE CAST(array() AS ARRAY<STRING>) END AS spans
                FROM tok)
          LATERAL VIEW posexplode(spans) p AS pos, sh),
        dup AS (SELECT sh FROM sp GROUP BY sh HAVING count(DISTINCT doc_id) >= 2),
        cov AS (
          SELECT DISTINCT s.doc_id, pp.p
          FROM sp s JOIN dup USING (sh)
          LATERAL VIEW explode(sequence(s.start, s.start + 4)) pp AS p),
        rem AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(size(t.toks) AS BIGINT) AS n_tokens,
               coalesce(rem.n_removed, 0L) AS n_removed,
               CAST(size(t.toks) AS BIGINT) - coalesce(rem.n_removed, 0L) AS n_kept,
               round((CAST(size(t.toks) AS BIGINT) - coalesce(rem.n_removed, 0L))
                     / CAST(size(t.toks) AS DOUBLE), 4) AS kept_ratio
        FROM tok t LEFT JOIN rem USING (doc_id)
        ORDER BY doc_id
      """)
    },
    Dedup.dedupSpans.oracle)

  def defs: Seq[QueryDef] = Seq(
    sqlStarJoin, sqlRollup, sqlWindowRank, sqlSetOps, sqlExists,
    sqlSessionize, sqlCte, sqlValues, sqlLimitOffset,
    sqlMinhashDedup, sqlCosineTopk, sqlTfIdf, sqlDedupSpans)
}
