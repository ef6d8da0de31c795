package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 projection/filter/predicates + the flagship §7 Step-1
  * pricing summary. All plans are scan→filter→(agg)→sort; Catalyst
  * pushes the filters and pruned columns into the parquet scan, and the
  * aggregate runs partial+final (map-side combine) — no extra shuffle
  * beyond the single groupBy exchange, which is the minimal plan at any
  * scale.
  */
object Relational extends QueryModule {

  /** TPC-H Q1 analog: full scan of the fact table, 2-key hash
    * aggregate. At 100 TB this is the canonical map-side-combine
    * pattern: partial HashAggregate per input partition, tiny shuffle
    * (|groups| = 6 rows per partition), final aggregate.
    */
  val pricingSummary = QueryDef(
    "q_pricing_summary",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          centsSum(col("l_extendedprice")).as("sum_base_price"),
          centsSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          centsSum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             ${centsSumSql("l_extendedprice")} AS sum_base_price,
             ${centsSumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
             ${centsSumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
             round(avg(l_quantity), 4) AS avg_qty,
             round(avg(l_extendedprice), 4) AS avg_price,
             round(avg(l_discount), 4) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """))

  /** Predicate kitchen sink: BETWEEN, IN, LIKE, IS NOT NULL, boolean
    * algebra. All six predicates reach the parquet scan as
    * PushedFilters (verified via explain), so row groups that can't
    * match are skipped at the reader.
    */
  val filterPredicates = QueryDef(
    "q_filter_predicates",
    (s, d) =>
      Tables.part(s, d)
        .filter(col("p_size").between(10, 40)
          && col("p_type").like("PROMO%")
          && col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
          && col("p_retailprice").isNotNull
          && (col("p_retailprice") > 500.0 || col("p_size") < 20))
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_type"), col("p_size"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey, p_name, p_brand, p_type, p_size
      FROM part
      WHERE p_size BETWEEN 10 AND 40
        AND p_type LIKE 'PROMO%'
        AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        AND p_retailprice IS NOT NULL
        AND (p_retailprice > 500.0 OR p_size < 20)
      ORDER BY p_partkey
    """))

  /** Conditional expressions: CASE WHEN, coalesce, nullif,
    * greatest/least. Pure projection — stays inside one
    * WholeStageCodegen span over the scan.
    */
  val conditionalExpr = QueryDef(
    "q_conditional",
    (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          when(col("o_orderstatus") === "F", "fulfilled")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("pending").as("status_label"),
          coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")),
            lit("none")).as("priority_or_none"),
          round(greatest(col("o_totalprice"), lit(1000.0)), 2).as("price_floor"),
          round(least(col("o_totalprice"), lit(100000.0)), 2).as("price_cap"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'F' THEN 'fulfilled'
                  WHEN o_orderstatus = 'O' THEN 'open'
                  ELSE 'pending' END AS status_label,
             coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'), 'none') AS priority_or_none,
             round(greatest(o_totalprice, 1000.0), 2) AS price_floor,
             round(least(o_totalprice, 100000.0), 2) AS price_cap
      FROM orders
      ORDER BY o_orderkey
    """))

  /** DISTINCT projection → partial+final hash aggregate on the two
    * columns; output cardinality is |segments|×|nations|, so the
    * shuffle is tiny regardless of input scale.
    */
  val distinctProjection = QueryDef(
    "q_distinct",
    (s, d) =>
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_nationkey"))
        .dropDuplicates(Seq("c_mktsegment", "c_nationkey"))
        .orderBy(col("c_mktsegment"), col("c_nationkey")),
    Some("""
      SELECT DISTINCT c_mktsegment, c_nationkey
      FROM customer
      ORDER BY c_mktsegment, c_nationkey
    """))

  /** Deterministic hash-stratified sampling: keep rows whose
    * md5(key)'s first hex digit is 0-3 (a reproducible ~25% Bernoulli
    * sample — no rand(), so reruns, retries, and the oracle all see
    * the same sample), reported per stratum. This is the sampling
    * primitive a 100 TB pipeline uses instead of TABLESAMPLE: pure
    * map-side, stable under partition reshuffles, and joinable (the
    * same key always lands in or out).
    */
  val hashSample = QueryDef(
    "q_sample_stratified",
    (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("total_docs"),
          count(when(substring(md5(col("doc_id").cast("string")), 1, 1) <= "3", 1))
            .as("sampled_docs"))
        .withColumn("sample_rate",
          (col("sampled_docs").cast("double") / col("total_docs")).cast("float"))
        .orderBy(col("lang")),
    Some("""
      SELECT lang, total_docs, sampled_docs,
             CAST(CAST(sampled_docs AS DOUBLE) / total_docs AS FLOAT) AS sample_rate
      FROM (
        SELECT lang, count(*) AS total_docs,
               count(*) FILTER (substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '3')
                 AS sampled_docs
        FROM documents GROUP BY lang)
      ORDER BY lang
    """))

  /** Data profiling (the SUMMARIZE-style surface): per-column row
    * count, distinct count, null count, and min/max for the orders
    * table, one row per profiled column via a stacked aggregate.
    * Exact integer outputs only — profiling is the one place users
    * compare numbers across runs, so nothing here can ulp-drift.
    * Single pass over the table; every aggregate combines map-side.
    */
  val profileOrders = QueryDef(
    "q_profile_orders",
    (s, d) => {
      val o = Tables.orders(s, d)
      val metrics = o.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("custkey_distinct"),
        sum(when(col("o_custkey").isNull, 1).otherwise(0)).as("custkey_nulls"),
        countDistinct(col("o_orderstatus")).as("status_distinct"),
        countDistinct(col("o_orderpriority")).as("priority_distinct"),
        min(col("o_orderdate")).cast("date").as("date_min"),
        max(col("o_orderdate")).cast("date").as("date_max"),
        round(min(col("o_totalprice")), 2).as("price_min"),
        round(max(col("o_totalprice")), 2).as("price_max"))
      metrics.select(
        col("n_rows"), col("custkey_distinct"), col("custkey_nulls"),
        col("status_distinct"), col("priority_distinct"),
        col("date_min"), col("date_max"), col("price_min"), col("price_max"))
    },
    Some("""
      SELECT count(*) AS n_rows,
             count(DISTINCT o_custkey) AS custkey_distinct,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS custkey_nulls,
             count(DISTINCT o_orderstatus) AS status_distinct,
             count(DISTINCT o_orderpriority) AS priority_distinct,
             CAST(min(o_orderdate) AS DATE) AS date_min,
             CAST(max(o_orderdate) AS DATE) AS date_max,
             round(min(o_totalprice), 2) AS price_min,
             round(max(o_totalprice), 2) AS price_max
      FROM orders
    """))

  /** WEIGHTED deterministic sampling — the importance-sampling upgrade
    * of q_sample_stratified's fixed-rate hash Bernoulli: each doc's
    * keep probability scales with its length (p = min(n_chars/600,1),
    * quantized to 1/256), and the keep decision compares the doc's
    * md5 prefix against the PER-ROW hex threshold lpad(hex(⌊p·256⌋)).
    * Same reproducibility contract as all hash sampling here: pure
    * map-side, stable across retries/repartitions, and the weights
    * are a literal edit. This is how a 100 TB pipeline upsamples
    * high-quality documents without a shuffle or an RNG.
    */
  val weightedSample = QueryDef(
    "q_sample_weighted",
    (s, d) => {
      // p = 1 must keep EVERYTHING: t = 256 maps to a sentinel above
      // any hex prefix ('g' > 'ff'), not a 255 clamp that would drop
      // exactly the highest-weight docs with probability 1/256
      val t = floor(least(col("n_chars") / 600.0, lit(1.0)) * 256).cast("int")
      val thresh = when(t >= 256, lit("g"))
        .otherwise(lower(lpad(hex(t), 2, "0")))
      Tables.documents(s, d)
        .select(col("lang"), col("n_chars"),
          (substring(md5(col("doc_id").cast("string")), 1, 2) < thresh)
            .as("kept"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("total_docs"),
          count(when(col("kept"), 1)).as("kept_docs"),
          round(avg(when(col("kept"), col("n_chars"))), 2).as("kept_avg_chars"),
          round(avg(col("n_chars")), 2).as("all_avg_chars"))
        .orderBy(col("lang"))
    },
    Some("""
      SELECT lang, count(*) AS total_docs,
             count(*) FILTER (kept) AS kept_docs,
             round(avg(n_chars) FILTER (kept), 2) AS kept_avg_chars,
             round(avg(n_chars), 2) AS all_avg_chars
      FROM (
        SELECT lang, n_chars,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
                 CASE WHEN CAST(floor(least(n_chars / 600.0, 1.0) * 256)
                        AS INTEGER) >= 256 THEN 'g'
                      ELSE lower(lpad(hex(CAST(floor(least(n_chars / 600.0, 1.0)
                        * 256) AS INTEGER)), 2, '0')) END AS kept
        FROM documents)
      GROUP BY lang
      ORDER BY lang
    """))

  /** Data-validation constraint suite (the Deequ/Great-Expectations
    * surface): a declared set of table constraints — key uniqueness,
    * non-null, value domain, numeric range, referential integrity —
    * evaluated in bulk and emitted as one (check_name, violations,
    * passed) report row each. The plan shape is what matters at
    * 100 TB: ALL per-table scalar checks fold into a single scan +
    * one-row aggregate per table (map-side combine, no per-check
    * rescans), unpivoted to rows with stack(); only the FK check pays
    * a join, and it's the shuffle-join the optimizer would pick for
    * fact×fact anyway. Every counter is an exact BIGINT — a
    * validation report is the last place a float may drift.
    */
  val constraintCheck = QueryDef(
    "q_constraint_check",
    (s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      val orderChecks = o.agg(
          (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("nn"),
          sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
            .otherwise(0L)).as("dom"))
        .select(expr("""stack(3,
          'orders_pk_unique', pk,
          'orders_custkey_not_null', nn,
          'orders_status_domain', dom) AS (check_name, violations)"""))
      val lineChecks = l.agg(
          sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L)).as("rng"),
          sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("pos"))
        .select(expr("""stack(2,
          'lineitem_qty_range', rng,
          'lineitem_price_positive', pos) AS (check_name, violations)"""))
      val fk = l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("lineitem_fk_orders").as("check_name"), col("violations"))
      orderChecks.unionByName(lineChecks).unionByName(fk)
        .withColumn("passed", col("violations") === 0L)
        .orderBy(col("check_name"))
    },
    Some("""
      WITH o AS (
        SELECT count(*) - count(DISTINCT o_orderkey) AS pk,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn,
               CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS dom
        FROM orders),
      l AS (
        SELECT CAST(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS BIGINT) AS rng,
               CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
        FROM lineitem),
      fk AS (
        SELECT count(*) AS v FROM lineitem
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)),
      rows_ AS (
        SELECT 'orders_pk_unique' AS check_name, pk AS violations FROM o
        UNION ALL SELECT 'orders_custkey_not_null', nn FROM o
        UNION ALL SELECT 'orders_status_domain', dom FROM o
        UNION ALL SELECT 'lineitem_qty_range', rng FROM l
        UNION ALL SELECT 'lineitem_price_positive', pos FROM l
        UNION ALL SELECT 'lineitem_fk_orders', v FROM fk)
      SELECT check_name, violations, violations = 0 AS passed
      FROM rows_ ORDER BY check_name
    """))

  def defs: Seq[QueryDef] =
    Seq(pricingSummary, filterPredicates, conditionalExpr, distinctProjection,
      hashSample, profileOrders, weightedSample, constraintCheck)
}
