package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Subquery forms via the SQL entry point: Catalyst decorrelates the
  * correlated scalar subquery (RewriteCorrelatedScalarSubquery → an
  * aggregate + join) and turns IN-subqueries into semi joins
  * (RewritePredicateSubquery) — so both run as ordinary shuffles at
  * scale, never per-row lookups. The oracle is near-identical ANSI
  * text.
  */
object Subqueries extends QueryModule {

  /** Correlated scalar subquery: customers above their nation's
    * average balance.
    */
  val scalarSubquery = QueryDef(
    "q_subquery_scalar",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_sq_v")
      // round(avg, 6): the group averages differ between engines at
      // ~1 ulp (different partial-sum order); rounding both sides
      // keeps the comparison threshold identical (balances have 2
      // decimals, so a 6-decimal threshold can't create new ties)
      s.sql("""
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer_sq_v c
        WHERE c_acctbal > (SELECT round(avg(c2.c_acctbal), 6)
                           FROM customer_sq_v c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey
      """)
    },
    Some("""
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer c
      WHERE c_acctbal > (SELECT round(avg(c2.c_acctbal), 6)
                         FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_custkey
    """))

  /** IN-subquery (rewritten to a left-semi join by Catalyst). */
  val inSubquery = QueryDef(
    "q_subquery_in",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_sq_v")
      Tables.customer(s, d).createOrReplaceTempView("customer_sq2_v")
      s.sql("""
        SELECT o_orderkey, o_orderdate
        FROM orders_sq_v
        WHERE o_custkey IN (SELECT c_custkey FROM customer_sq2_v
                            WHERE c_mktsegment = 'BUILDING')
          AND o_orderstatus = 'O'
        ORDER BY o_orderkey
      """)
    },
    Some("""
      SELECT o_orderkey, o_orderdate
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')
        AND o_orderstatus = 'O'
      ORDER BY o_orderkey
    """))

  /** GROUP BY ALL — the SQL-surface convenience both engines grew
    * (group on every non-aggregate select item). Exercised through
    * spark.sql so the SQL TEXT path is what's graded, same as the
    * subquery entries.
    */
  val groupByAll = QueryDef(
    "q_group_by_all",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gba_v")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS cnt, round(sum(o_totalprice), 2) AS total
        FROM orders_gba_v
        GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority
      """)
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             count(*) AS cnt, round(sum(o_totalprice), 2) AS total
      FROM orders
      GROUP BY ALL
      ORDER BY o_orderstatus, o_orderpriority
    """))

  def defs: Seq[QueryDef] = Seq(scalarSubquery, inSubquery, groupByAll)
}
