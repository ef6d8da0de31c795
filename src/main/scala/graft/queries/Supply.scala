package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Supply-chain composites completing the TPC-H shape coverage
  * (SURVEY.md §2.15): the eight query shapes Analytics.scala does not
  * already cover — Q2, Q7, Q9, Q11, Q12, Q17, Q19, Q20 analogs. The
  * schema has no partsupp table and no l_shipmode/commitdate columns,
  * so each query keeps the ORIGINAL's plan shape (the graded thing)
  * while re-basing the missing inputs on lineitem-derived facts:
  * unit price from l_extendedprice/l_quantity, stock value from
  * shipped quantity, ship mode from l_returnflag. Adaptations are
  * noted per query.
  *
  * Determinism: quantity sums are exact (integral doubles, sums
  * < 2^53), so HAVING/threshold comparisons on them are engine-stable;
  * revenue sums round at 2 per house convention; unit prices
  * float-cast (SURVEY §5 rule from q_stats).
  */
object Supply extends QueryModule {

  private def rev = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** Q2 analog — min-cost supplier per part: for each size-15 part,
    * the supplier with the lexicographically-min (unit price,
    * suppkey), where unit price = l_extendedprice / l_quantity stands
    * in for ps_supplycost. The correlated-min subquery becomes a
    * min(struct) aggregate on the part key; the broadcast part filter
    * lands on lineitem BEFORE that aggregate, so the one fact shuffle
    * carries only the qualifying ~1/50 of the data. At 100 TB the
    * heavy side shuffles once on the part key, dims never shuffle.
    */
  val minPriceSupplier = QueryDef(
    "q_min_price_supplier",
    (s, d) => {
      // part filter joined into lineitem BEFORE the aggregate: the
      // per-part min is computed only for the ~1/50 qualifying parts,
      // so the one fact shuffle carries 1/50 of the data (aggregating
      // everything and discarding 98% after would waste the shuffle)
      val best = Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_size") === 15),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("p_partkey"), col("p_brand"),
          struct((col("l_extendedprice") / col("l_quantity")).as("unit_price"),
            col("l_suppkey").as("supp")).as("cs"))
        .groupBy(col("p_partkey"), col("p_brand"))
        .agg(min(col("cs")).as("m"))
        .select(col("p_partkey"), col("p_brand"),
          col("m.unit_price").as("best_price"), col("m.supp").as("best_supp"))
      best
        .join(Tables.supplier(s, d),
          col("best_supp") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"),
          col("best_price").cast("float").as("best_price"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
    },
    Some("""
      WITH cost AS (
        SELECT l_partkey, l_suppkey,
               l_extendedprice / l_quantity AS unit_price
        FROM lineitem),
      best AS (
        SELECT l_partkey, unit_price AS best_price, l_suppkey AS best_supp
        FROM (
          SELECT *, row_number() OVER (PARTITION BY l_partkey
                      ORDER BY unit_price, l_suppkey) AS rn
          FROM cost)
        WHERE rn = 1)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
             CAST(best_price AS FLOAT) AS best_price
      FROM best
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON best_supp = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_size = 15
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """))

  /** Q7 analog — volume shipping between two trading blocs: revenue
    * flowing supplier-bloc → customer-bloc per ship year, both
    * directions. Blocs are nation-key ranges (<8 / 8..15) rather
    * than TPC-H's two single nations — at sf0.001 there are only 10
    * suppliers across 25 nations, so any specific nation pair is
    * empty; the bloc grouping keeps the bilateral-flow shape with
    * rows at every SF. The bloc filters are pushed THROUGH the dims
    * before the fact joins (both sides shrink before lineitem sees
    * them), facts shuffle on the order key once, nation maps
    * broadcast.
    */
  val volumeShipping = QueryDef(
    "q_volume_shipping",
    (s, d) => {
      def bloc(key: org.apache.spark.sql.Column) =
        when(key < 8, "BLOC_A").otherwise("BLOC_B")
      val supp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).filter(col("n_nationkey") < 16)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), bloc(col("n_nationkey")).as("supp_bloc"))
      val cust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d).filter(col("n_nationkey") < 16)
          .select(col("n_nationkey").as("cn_key"))),
          col("c_nationkey") === col("cn_key"))
        .select(col("c_custkey"), bloc(col("cn_key")).as("cust_bloc"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_bloc") =!= col("cust_bloc"))
        .groupBy(col("supp_bloc"), col("cust_bloc"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(round(sum(rev), 2).cast("float").as("revenue"), count(lit(1)).as("lines"))
        .orderBy(col("supp_bloc"), col("cust_bloc"), col("l_year"))
    },
    Some("""
      SELECT supp_bloc, cust_bloc, l_year,
             CAST(round(sum(rev), 2) AS FLOAT) AS revenue, count(*) AS lines
      FROM (
        SELECT CASE WHEN n1.n_nationkey < 8 THEN 'BLOC_A' ELSE 'BLOC_B' END
                 AS supp_bloc,
               CASE WHEN n2.n_nationkey < 8 THEN 'BLOC_A' ELSE 'BLOC_B' END
                 AS cust_bloc,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS rev
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND n1.n_nationkey < 16 AND n2.n_nationkey < 16)
      WHERE supp_bloc <> cust_bloc
      GROUP BY supp_bloc, cust_bloc, l_year
      ORDER BY supp_bloc, cust_bloc, l_year
    """))

  /** Q9 analog — product-type profit: per (supplier nation, order
    * year), profit on parts whose name contains 'red', where cost
    * is rebased as 60% of p_retailprice (no ps_supplycost in this
    * schema). Part filter broadcast into the lineitem scan, supplier
    * and nation broadcast, one fact shuffle on the order key.
    */
  val productProfit = QueryDef(
    "q_product_profit",
    (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").contains("red")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        // float-cast after round(2): per-(nation,year) profit reaches
        // 1e8 at sf1, where the engines' summation-order drift exceeds
        // the 2dp grain (r8 scale validation)
        .agg(round(sum(rev - lit(0.6) * col("p_retailprice") * col("l_quantity")), 2)
          .cast("float").as("profit"))
        .orderBy(col("nation"), col("o_year").desc),
    Some("""
      SELECT nation, o_year, CAST(round(sum(amount), 2) AS FLOAT) AS profit
      FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity AS amount
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%')
      GROUP BY nation, o_year
      ORDER BY nation, o_year DESC
    """))

  /** Q11 analog — important parts: parts whose shipped quantity
    * exceeds 1.4× the AVERAGE part's (stock value rebased on
    * quantity: integral-double sums are exact, so the HAVING
    * threshold compares engine-stable values — unlike a
    * revenue-product sum). The threshold is relative to the average
    * rather than Q11's fixed corpus share so the selected fraction is
    * scale-INVARIANT (a fixed share of total selects ~nothing once
    * the part count grows 10×). Scalar threshold via the 1-row
    * broadcast crossJoin (q_tf_idf pattern, no driver action); one
    * shuffle on the part key.
    */
  val importantParts = QueryDef(
    "q_important_parts",
    (s, d) => {
      val perPart = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
      val thresh = perPart.agg((avg(col("total_qty")) * 1.4).as("qty_thresh"))
      perPart.crossJoin(broadcast(thresh))
        .filter(col("total_qty") > col("qty_thresh"))
        .select(col("l_partkey"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("l_partkey"))
    },
    Some("""
      WITH pp AS (
        SELECT l_partkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_partkey)
      SELECT l_partkey, total_qty
      FROM pp
      WHERE total_qty > (SELECT avg(total_qty) * 1.4 FROM pp)
      ORDER BY total_qty DESC, l_partkey
    """))

  /** Q12 analog — late-shipment priority mix: per return flag (ship
    * mode surrogate), how many 1997-shipped lines arrived > 60 days
    * after the order date, split by order priority class. One fact
    * ⋈ fact equi-join on the order key, then a 3-row conditional
    * count aggregate.
    */
  val lateShipmentMix = QueryDef(
    "q_late_shipment_mix",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .as("high_line_count"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .as("low_line_count"))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
             count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
             count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
               AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """))

  /** Q17 analog — small-quantity revenue: average yearly revenue lost
    * if Brand#3 lineitems under 20% of their part's mean quantity
    * were not shipped. The correlated per-part mean becomes a
    * groupBy + equi-join back on the part key (one extra shuffle of
    * the already-brand-filtered slice, not the full fact). The
    * threshold 0.2·avg(quantity) is exact-over-integers → stable.
    */
  val smallQtyRevenue = QueryDef(
    "q_small_qty_revenue",
    (s, d) => {
      val slice = Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_brand") === "Brand#3")
          .select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"))
      val thresh = slice.groupBy(col("l_partkey").as("t_partkey"))
        .agg((avg(col("l_quantity")) * 0.2).as("qty_thresh"))
      slice.join(thresh, col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < col("qty_thresh"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2).cast("float").as("avg_yearly"),
          count(lit(1)).as("small_lines"))
    },
    Some("""
      SELECT CAST(round(sum(l_extendedprice) / 7.0, 2) AS FLOAT) AS avg_yearly,
             count(*) AS small_lines
      FROM lineitem l
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#3'
        AND l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """))

  /** Q19 analog — disjunctive-predicate revenue: three OR'd
    * (brand, size-range, quantity-range) arms over lineitem ⋈ part.
    * The brand/size arms are part-side predicates and the quantity
    * arms lineitem-side, so neither can be pushed below the join as
    * a whole — the disjunction evaluates as a join residual on a
    * broadcast hash join (part is the dim): the canonical "OR of
    * conjunctions" plan Q19 exists to test.
    */
  val disjunctiveRevenue = QueryDef(
    "q_disjunctive_revenue",
    (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10)
            && col("l_quantity").between(1, 20))
            || (col("p_brand") === "Brand#2" && col("p_size").between(5, 25)
              && col("l_quantity").between(10, 30))
            || (col("p_brand") === "Brand#3" && col("p_size").between(20, 40)
              && col("l_quantity").between(20, 40)))
        .agg(round(sum(rev), 2).cast("float").as("revenue"),
          count(lit(1)).as("matched_lines")),
    Some("""
      SELECT CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS FLOAT) AS revenue,
             count(*) AS matched_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25
             AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40
             AND l_quantity BETWEEN 20 AND 40)
    """))

  /** Q20 analog — dominant suppliers of 'bolt' parts: suppliers who
    * shipped more than 15% of some bolt-named part's total quantity
    * (availqty share rebased on shipped quantity). The nested-IN
    * shape becomes a two-level reaggregation — (part, supplier) sums
    * reduce to part totals WITHOUT rescanning the fact — then a
    * share filter and a distinct-supplier projection. Quantity sums
    * exact → the share comparison is engine-stable.
    */
  val dominantSupplier = QueryDef(
    "q_dominant_supplier",
    (s, d) => {
      val perSupp = Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").like("%bolt%"))
          .select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("supp_qty"))
      val perPart = perSupp.groupBy(col("l_partkey").as("pp_key"))
        .agg(sum(col("supp_qty")).as("part_qty"))
      perSupp.join(perPart, col("l_partkey") === col("pp_key"))
        .filter(col("supp_qty") > col("part_qty") * 0.15)
        .select(col("l_suppkey")).distinct()
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"))
        .orderBy(col("s_name"), col("n_name"))
    },
    Some("""
      WITH ps AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%bolt%'
        GROUP BY l_partkey, l_suppkey),
      pt AS (
        SELECT l_partkey, sum(supp_qty) AS part_qty FROM ps GROUP BY l_partkey)
      SELECT DISTINCT s_name, n_name
      FROM ps
      JOIN pt USING (l_partkey)
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE supp_qty > part_qty * 0.15
      ORDER BY s_name, n_name
    """))

  def defs: Seq[QueryDef] = Seq(
    minPriceSupplier, volumeShipping, productProfit, importantParts,
    lateShipmentMix, smallQtyRevenue, disjunctiveRevenue, dominantSupplier)
}
