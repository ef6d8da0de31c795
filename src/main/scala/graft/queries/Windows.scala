package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5 window-function inventory. Each window spec shuffles
  * once on its partition key then sorts within partitions — at scale
  * the partition key must be high-cardinality (user_id, custkey) so no
  * single partition dominates; all specs here satisfy that.
  *
  * Determinism: row_number/ntile/lag/lead order by a UNIQUE composite
  * (ties would be nondeterministic); rank/dense_rank may order by a
  * non-unique key because ties produce equal (deterministic) outputs.
  */
object Windows extends QueryModule {

  /** Ranking family: row_number, rank, dense_rank, ntile. */
  val windowRank = QueryDef(
    "q_window_rank",
    (s, d) => {
      val unique = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      val byBal = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          row_number().over(unique).cast("long").as("rn"),
          rank().over(byBal).cast("long").as("rnk"),
          dense_rank().over(byBal).cast("long").as("drnk"),
          ntile(4).over(unique).cast("long").as("quartile"),
          // int-ratio windows produce IDENTICAL doubles in both
          // engines (exact integer division) — cast to float32 (an
          // IEEE-deterministic rounding) instead of round(), which
          // diverges when the exact decimal ends on the boundary
          percent_rank().over(byBal).cast("float").as("pct_rank"),
          cume_dist().over(byBal).cast("float").as("cume"),
          nth_value(col("c_custkey"), 2).over(
            unique.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .as("second_richest"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_nationkey,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
             rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
             dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk,
             ntile(4)     OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile,
             CAST(percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS FLOAT) AS pct_rank,
             CAST(cume_dist()    OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS FLOAT) AS cume,
             nth_value(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_richest
      FROM customer
      ORDER BY c_custkey
    """))

  /** Analytic family: lag, lead, first_value, last_value (full frame). */
  val windowAnalytic = QueryDef(
    "q_window_analytic",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          first(col("event_type")).over(full).as("first_type"),
          last(col("event_type")).over(full).as("last_type"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id,
             lag(value, 1)  OVER w AS prev_value,
             lead(value, 1) OVER w AS next_value,
             first_value(event_type) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
             last_value(event_type)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id
    """))

  /** Running total: cumulative sum per customer in order-date order.
    * The window ordering fixes the float accumulation sequence, so
    * both engines add in the same order — round(2) then matches.
    */
  val windowRunning = QueryDef(
    "q_window_running",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_spend"),
          count(lit(1)).over(w).as("orders_so_far"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             round(sum(o_totalprice) OVER w, 2) AS running_spend,
             count(*) OVER w AS orders_so_far
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey
    """))

  /** Event-time moving window: per-user rolling 1-hour sum. Both sides
    * order by exact epoch microseconds (Spark unix_micros ≡ DuckDB
    * epoch_us) so the RANGE frame boundaries agree to the microsecond.
    */
  val windowRangeRolling = QueryDef(
    "q_window_rolling",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          round(sum(col("value")).over(w), 2).as("rolling_1h_value"),
          count(lit(1)).over(w).as("rolling_1h_events"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id,
             round(sum(value) OVER w, 2) AS rolling_1h_value,
             count(*) OVER w AS rolling_1h_events
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id
    """))

  /** Top-k per group via row_number ≤ k. At scale Spark 3.5+/4 pushes
    * a per-partition rank limit (WindowGroupLimit) before the shuffle,
    * so only k rows per group per partition move.
    */
  val topKPerGroup = QueryDef(
    "q_topk_per_group",
    (s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy(col("l_returnflag"), col("rn"))
    },
    Some("""
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn
      FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem
      )
      WHERE rn <= 3
      ORDER BY l_returnflag, rn
    """))

  /** Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    * each partition keeps a k-row heap, driver merges k×partitions
    * rows; no global sort ever materializes.
    */
  val sortLimit = QueryDef(
    "q_sort_limit",
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
    Some("""
      SELECT o_orderkey, o_totalprice, o_orderdate
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10
    """))

  /** Keyset-free pagination: page 3 of the price-ranked orders via
    * LIMIT+OFFSET over a TOTAL order (unique tiebreak — without it,
    * page boundaries are nondeterministic and rows repeat or vanish
    * between pages). Spark still plans a top-(offset+limit) heap per
    * partition, so cost grows with page DEPTH — at 100 TB deep pages
    * should switch to keyset pagination (WHERE (price, key) < last
    * seen), which this formulation's total order makes possible.
    */
  val pagination = QueryDef(
    "q_pagination",
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(20)
        .limit(10),
    Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10 OFFSET 20
    """))

  /** Numeric RANGE frame (non-time): per customer, how many of their
    * orders fall within ±5000 of each order's price, via the SQL
    * entry point (the typed DSL's rangeBetween is integral-only).
    */
  val windowRangeNumeric = QueryDef(
    "q_window_range_numeric",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_rn_v")
      s.sql("""
        SELECT o_orderkey, o_custkey,
               count(*) OVER w AS similar_priced,
               round(sum(o_totalprice) OVER w, 2) AS similar_total
        FROM orders_rn_v
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                     RANGE BETWEEN 5000.0 PRECEDING AND 5000.0 FOLLOWING)
        ORDER BY o_orderkey
      """)
    },
    Some("""
      SELECT o_orderkey, o_custkey,
             count(*) OVER w AS similar_priced,
             round(sum(o_totalprice) OVER w, 2) AS similar_total
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                   RANGE BETWEEN 5000.0 PRECEDING AND 5000.0 FOLLOWING)
      ORDER BY o_orderkey
    """))

  /** IGNORE NULLS analytics — forward-fill (LOCF): sensor-style "last
    * known good value" carried over gaps. The gaps are synthesized
    * deterministically (non-click events report no value), then
    * last(..., ignoreNulls) over the running frame fills them; also
    * the first non-null reading per user via first(..., ignoreNulls).
    * One window pass, same shuffle profile as any running total.
    */
  val windowIgnoreNulls = QueryDef(
    "q_window_ignore_nulls",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          when(col("event_type") === "click", col("value")).as("reading"),
          col("ts"))
        .select(col("event_id"), col("user_id"), col("reading"),
          last(col("reading"), ignoreNulls = true).over(run).as("filled"),
          first(col("reading"), ignoreNulls = true).over(run).as("first_reading"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, reading,
             last_value(reading IGNORE NULLS) OVER w AS filled,
             first_value(reading IGNORE NULLS) OVER w AS first_reading
      FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'click' THEN value END AS reading
        FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY event_id
    """))

  /** Distinct count over a running window — neither engine supports
    * COUNT(DISTINCT) OVER natively, so the portable rewrite is the
    * set-aggregate over the frame: collect_set size in Spark,
    * list_distinct(list(...)) length in DuckDB. State per row is the
    * frame's distinct set — bounded here by |event types| (5), which
    * is what makes it viable at scale; for high-cardinality values
    * use the approx sketch instead.
    */
  val windowCountDistinct = QueryDef(
    "q_window_count_distinct",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          size(collect_set(col("event_type")).over(w)).cast("long")
            .as("distinct_types_so_far"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id,
             CAST(len(list_distinct(list(event_type) OVER w)) AS BIGINT)
               AS distinct_types_so_far
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY event_id
    """))

  /** Share-of-total (RATIO_TO_REPORT): each nation's revenue as a
    * fraction of the global total, via an unpartitioned window sum
    * over the |nations|-row AGGREGATE (25 rows — the window never
    * sees fact-table rows, so the single-partition frame is free;
    * putting the window over the raw fact table instead would
    * serialize the corpus through one partition).
    */
  val windowShareOfTotal = QueryDef(
    "q_share_of_total",
    (s, d) => {
      val perNation = Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(sum(col("o_totalprice")).as("rev"))
      val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      perNation
        .select(col("c_nationkey"),
          round(col("rev"), 2).cast("float").as("revenue"),
          (col("rev") / sum(col("rev")).over(w)).cast("float").as("share"))
        .orderBy(col("c_nationkey"))
    },
    Some("""
      SELECT c_nationkey, CAST(round(rev, 2) AS FLOAT) AS revenue,
             CAST(rev / sum(rev) OVER () AS FLOAT) AS share
      FROM (
        SELECT c_nationkey, sum(o_totalprice) AS rev
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_nationkey)
      ORDER BY c_nationkey
    """))

  /** Gaps-and-islands: each customer's longest streak of CONSECUTIVE
    * order months. The island key is the classic
    * `month_number - row_number()` trick — consecutive months share a
    * constant difference — so the whole pattern is one window pass
    * plus two bounded aggregations; work scales with |customer×month|,
    * never with raw orders.
    */
  val orderStreaks = QueryDef(
    "q_order_streaks",
    (s, d) => {
      val months = Tables.orders(s, d)
        .select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("mnum"))
        .distinct()
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("mnum"))
      months
        .withColumn("grp", col("mnum") - row_number().over(w))
        .groupBy(col("o_custkey"), col("grp"))
        .agg(count(lit(1)).as("streak"))
        .groupBy(col("o_custkey"))
        .agg(max(col("streak")).as("longest_streak"))
        .filter(col("longest_streak") >= 4)
        .orderBy(col("o_custkey"))
    },
    Some("""
      WITH months AS (
        SELECT DISTINCT o_custkey,
               CAST(date_part('year', o_orderdate) * 12
                    + date_part('month', o_orderdate) AS BIGINT) AS mnum
        FROM orders),
      islands AS (
        SELECT o_custkey,
               mnum - row_number() OVER (PARTITION BY o_custkey ORDER BY mnum) AS grp
        FROM months)
      SELECT o_custkey, longest_streak
      FROM (
        SELECT o_custkey, max(streak) AS longest_streak
        FROM (SELECT o_custkey, grp, count(*) AS streak
              FROM islands GROUP BY o_custkey, grp)
        GROUP BY o_custkey)
      WHERE longest_streak >= 4
      ORDER BY o_custkey
    """))

  /** Distribution-position window functions: percent_rank
    * ((rank−1)/(n−1)) and cume_dist (rows ≤ current / n). Both are
    * exact rational divisions of counts, so the doubles are
    * bit-identical across engines — rounded to 6dp only to keep the
    * artifact tidy. Same single-shuffle window shape as q_window_rank.
    */
  val windowPct = QueryDef(
    "q_window_pct",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey
    """))

  /** Explicit null-ordering semantics: Spark's ASC default is NULLS
    * FIRST, DuckDB's is NULLS LAST — unpinned null placement is a
    * classic cross-engine silent diff, so both sides pin ASC NULLS
    * LAST on a key that actually contains nulls (nullif-projected).
    */
  val nullOrdering = QueryDef(
    "q_null_ordering",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), nullif(col("lang"), lit("en")).as("other_lang"))
        .orderBy(col("other_lang").asc_nulls_last, col("doc_id"))
        .limit(300),
    Some("""
      SELECT doc_id, nullif(lang, 'en') AS other_lang
      FROM documents
      ORDER BY other_lang ASC NULLS LAST, doc_id
      LIMIT 300
    """))

  /** Exact rolling median: percentile(x, 0.5) over a 5-row trailing
    * frame per customer (Spark's `median` refuses a frame; the
    * percentile form is the documented equivalent). DuckDB mirror is
    * quantile_cont — both interpolate the midpoint of the two middle
    * values, float-cast to collapse interpolation ulp. Exact windowed
    * percentiles buffer the frame per row, so the 100 TB guidance in
    * the Scaladoc of q_approx_percentile applies: beyond small frames
    * switch to the sketch.
    */
  val windowMedian = QueryDef(
    "q_window_median",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-4, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          expr("percentile(o_totalprice, 0.5)")
            .over(w).cast("float").as("rolling_median_price"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_custkey,
             CAST(quantile_cont(o_totalprice, 0.5) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS FLOAT)
               AS rolling_median_price
      FROM orders
      ORDER BY o_orderkey
    """))

  /** The SQL-text WINDOW clause (named window shared by several
    * functions) exercised through Spark's OWN SQL entry point — every
    * other window query here is DataFrame-API on the Spark side with
    * the WINDOW clause only in the oracle text; this one grades the
    * SQL surface itself. One named spec feeds row_number, lag, and a
    * cents-exact running sum; single shuffle on user_id, unique
    * (ts, event_id) ordering so the default RANGE frame is
    * deterministic. The running money sum follows the full
    * integer-cents contract (centsSum): Spark accumulates in
    * DECIMAL(38,0) — a window sum over BIGINT would stay LONG and
    * wrap where DuckDB's HUGEINT stays exact — and both engines cast
    * the exact integer to DOUBLE before the /100.0.
    */
  val windowNamed = QueryDef(
    "q_window_named",
    (s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events_nw_v")
      s.sql("""
        SELECT event_id, user_id, event_type,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               lag(event_type) OVER w AS prev_type,
               CAST(sum(CAST(round(value * 100) AS DECIMAL(38,0))) OVER w AS DOUBLE)
                 / 100.0 AS run_value
        FROM events_nw_v
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, rn
      """)
    },
    Some("""
      SELECT event_id, user_id, event_type,
             row_number() OVER w AS rn,
             lag(event_type) OVER w AS prev_type,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE)
               / 100.0 AS run_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, rn
    """))

  def defs: Seq[QueryDef] = Seq(
    windowRank, windowAnalytic, windowRunning, windowRangeRolling,
    topKPerGroup, sortLimit, windowRangeNumeric, windowIgnoreNulls,
    windowCountDistinct, windowShareOfTotal, orderStreaks, windowPct,
    nullOrdering, windowMedian, pagination, windowNamed)
}
