package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.7 set operations. Distinct variants are hash
  * aggregates over the union; ALL variants are reduced to per-key
  * counts so the graded output stays small and deterministic at any
  * scale.
  */
object SetOps extends QueryModule {

  private def custNations(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
  private def suppNations(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))

  /** UNION (distinct): nations having customers or suppliers. */
  val setUnion = QueryDef(
    "q_set_union",
    (s, d) =>
      custNations(s, d).union(suppNations(s, d))
        .distinct()
        .orderBy(col("nationkey")),
    Some("""
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey
    """))

  /** UNION ALL keeps multiplicity; reduced to per-key counts. */
  val setUnionAll = QueryDef(
    "q_set_union_all",
    (s, d) =>
      custNations(s, d).unionAll(suppNations(s, d))
        .groupBy(col("nationkey"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("nationkey")),
    Some("""
      SELECT nationkey, count(*) AS cnt
      FROM (SELECT c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT s_nationkey FROM supplier)
      GROUP BY nationkey
      ORDER BY nationkey
    """))

  /** INTERSECT (distinct): nations with both customers and suppliers. */
  val setIntersect = QueryDef(
    "q_set_intersect",
    (s, d) =>
      custNations(s, d).intersect(suppNations(s, d))
        .orderBy(col("nationkey")),
    Some("""
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey
    """))

  /** INTERSECT ALL (multiset): min of the two multiplicities per key,
    * reduced to counts for a stable output.
    */
  val setIntersectAll = QueryDef(
    "q_set_intersect_all",
    (s, d) =>
      custNations(s, d).intersectAll(suppNations(s, d))
        .groupBy(col("nationkey"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("nationkey")),
    Some("""
      SELECT nationkey, count(*) AS cnt
      FROM (SELECT c_nationkey AS nationkey FROM customer
            INTERSECT ALL
            SELECT s_nationkey FROM supplier)
      GROUP BY nationkey
      ORDER BY nationkey
    """))

  /** EXCEPT (distinct): orderkeys seen in lineitem minus fulfilled
    * orders — i.e. orders still open/pending.
    */
  val setExcept = QueryDef(
    "q_set_except",
    (s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey").as("orderkey"))
        .except(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")))
        .orderBy(col("orderkey")),
    Some("""
      SELECT l_orderkey AS orderkey FROM lineitem
      EXCEPT
      SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY orderkey
    """))

  /** EXCEPT ALL (multiset difference), reduced to counts. */
  val setExceptAll = QueryDef(
    "q_set_except_all",
    (s, d) =>
      custNations(s, d).exceptAll(suppNations(s, d))
        .groupBy(col("nationkey"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("nationkey")),
    Some("""
      SELECT nationkey, count(*) AS cnt
      FROM (SELECT c_nationkey AS nationkey FROM customer
            EXCEPT ALL
            SELECT s_nationkey FROM supplier)
      GROUP BY nationkey
      ORDER BY nationkey
    """))

  /** unionByName: columns matched by NAME across differently-ordered
    * projections (positional union would silently mis-align).
    */
  val setUnionByName = QueryDef(
    "q_set_union_by_name",
    (s, d) => {
      val a = Tables.customer(s, d)
        .select(col("c_custkey").as("id"), col("c_mktsegment").as("seg"))
      val b = Tables.customer(s, d)
        .filter(col("c_nationkey") < 5)
        .select(col("c_mktsegment").as("seg"), col("c_custkey").as("id"))
      a.unionByName(b)
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("cnt"), countDistinct(col("id")).as("distinct_ids"))
        .orderBy(col("seg"))
    },
    Some("""
      SELECT seg, count(*) AS cnt, count(DISTINCT id) AS distinct_ids
      FROM (
        SELECT c_custkey AS id, c_mktsegment AS seg FROM customer
        UNION ALL
        SELECT c_custkey AS id, c_mktsegment AS seg FROM customer WHERE c_nationkey < 5)
      GROUP BY seg
      ORDER BY seg
    """))

  def defs: Seq[QueryDef] = Seq(
    setUnion, setUnionAll, setIntersect, setIntersectAll,
    setExcept, setExceptAll, setUnionByName)
}
