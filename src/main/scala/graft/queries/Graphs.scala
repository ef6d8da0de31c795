package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph topology operators over the nation-level trade graph —
  * triangle counting and k-hop BFS distances, the two classic
  * "structure of the graph" questions next to q_pagerank's
  * centrality. Both run on a deterministically SPARSIFIED edge set
  * (keep an undirected edge only when its weight is strictly above
  * the mean — compared in exact bigint cross-multiplied form, never a
  * float mean) so the dense 25-nation clique becomes a non-trivial
  * topology and the threshold can never sit on a float boundary.
  *
  * Scale design: the one fact-sized job is the edge aggregation
  * (one shuffle of the lineitem⋈orders⋈customer⋈supplier star on the
  * nation-pair key); everything downstream — the triangle 3-way
  * self-join, the BFS rounds — runs on a ≤|nations|² edge table. The
  * edge table is localCheckpointed and memoized per (session, dir)
  * like Dedup.verifiedPairs, because the triangle query references it
  * three times and BFS four times, and static exchange reuse does NOT
  * dedupe a repeated subtree across self-join/union branches (the
  * q_pagerank 34-scan lesson, NOTES.md). At 100 TB the same shape
  * holds: aggregate the fact once, iterate on the small graph.
  */
object Graphs extends QueryModule {

  private val edgeCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  /** Drop the memoized edge table; re-derived identically on next use
    * (CachesSpec). See Graft.clearCaches.
    */
  private[graft] def clearCache(): Unit = edgeCache.clear()

  /** Force the memoized edge table (eager checkpoint) for an untimed
    * bench warmup — the shared per-dataset build cost, not any one
    * query's. See Dedup.warm.
    */
  private[graft] def warm(s: SparkSession, d: String): Unit = {
    keptEdges(s, d); ()
  }

  /** Undirected above-mean-weight trade edges (a < b), memoized.
    * Construction pays one Spark job (the localCheckpoint action) —
    * same contract as Dedup.verifiedPairs / Tables.eventsByDate.
    */
  private def keptEdges(s: SparkSession, d: String): DataFrame =
    edgeCache.computeIfAbsent((s, d), _ => {
      val e0 = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").cast("long").as("src"),
          col("s_nationkey").cast("long").as("dst"))
        .agg(count(lit(1)).as("w"))
      val und = e0.filter(col("src") =!= col("dst"))
        .groupBy(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .agg(sum(col("w")).as("w"))
      // strictly-above-mean in cross-multiplied bigint form:
      // w * n_edges > total_w  ⇔  w > total_w / n_edges, exactly
      val stats = und.agg(count(lit(1)).as("ne"), sum(col("w")).as("tw"))
      // EAGER checkpoint (as documented above and as KMeansLite does):
      // the lazy variant would defer materialization to the first
      // action, letting two concurrently-launched first queries each
      // run the fact-sized edge aggregation before the cache warms
      und.crossJoin(stats)
        .filter(col("w") * col("ne") > col("tw"))
        .select(col("a"), col("b"), col("w"))
        .localCheckpoint()
    })

  /** Oracle CTE producing the identical `kept(a, b)` edge set. The
    * MATERIALIZED hints matter: DuckDB inlines CTEs by default, and
    * the k-hop oracle references each round twice (frontier + join) —
    * inlining re-expands the fact-sized e0 subtree 2^rounds times
    * (measured: 150+ CPU-minutes at sf0.1 before the fix; <1 s with
    * materialization). The Spark side has the same hazard and solves
    * it with the localCheckpoint above.
    */
  private val keptCte = """
      e0 AS MATERIALIZED (
        SELECT CAST(c_nationkey AS BIGINT) AS src,
               CAST(s_nationkey AS BIGINT) AS dst, count(*) AS w
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2),
      und AS MATERIALIZED (
        SELECT least(src, dst) AS a, greatest(src, dst) AS b,
               CAST(sum(w) AS BIGINT) AS w
        FROM e0 WHERE src <> dst GROUP BY 1, 2),
      stats AS MATERIALIZED (SELECT count(*) AS ne, CAST(sum(w) AS BIGINT) AS tw FROM und),
      kept AS MATERIALIZED (SELECT a, b, w FROM und CROSS JOIN stats WHERE w * ne > tw)"""

  /** Per-node triangle participation: enumerate each triangle once in
    * canonical a<b<c orientation ((a,b)⋈(b,c)⋈(a,c) over the ordered
    * edge list — the standard compact-forward algorithm shape), then
    * explode to the 3 corners and count per node. All joins are on
    * the tiny kept-edge table; at scale the worst case is bounded by
    * the edge list, never the fact table.
    */
  val triangles = QueryDef(
    "q_triangles",
    (s, d) => {
      val kept = keptEdges(s, d)
      val e1 = kept.select(col("a").as("x"), col("b").as("y"))
      val e2 = kept.select(col("a").as("y2"), col("b").as("z"))
      val e3 = kept.select(col("a").as("x3"), col("b").as("z3"))
      val tris = e1
        .join(e2, col("y") === col("y2"))
        .join(e3, col("x3") === col("x") && col("z3") === col("z"))
        .select(col("x"), col("y"), col("z"))
      val pernode = tris.select(col("x").as("v"))
        .unionAll(tris.select(col("y").as("v")))
        .unionAll(tris.select(col("z").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("n_triangles"))
      pernode
        .join(Tables.nation(s, d), col("v") === col("n_nationkey"))
        .select(col("v").as("nationkey"), col("n_name").as("nation"),
          col("n_triangles"))
        .orderBy(col("n_triangles").desc, col("nationkey"))
    },
    Some(s"""
      WITH $keptCte,
      tris AS MATERIALIZED (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM kept e1
        JOIN kept e2 ON e1.b = e2.a
        JOIN kept e3 ON e3.a = e1.a AND e3.b = e2.b),
      pernode AS MATERIALIZED (
        SELECT v, count(*) AS n_triangles FROM (
          SELECT x AS v FROM tris
          UNION ALL SELECT y FROM tris
          UNION ALL SELECT z FROM tris)
        GROUP BY v)
      SELECT CAST(v AS BIGINT) AS nationkey, n_name AS nation,
             CAST(n_triangles AS BIGINT) AS n_triangles
      FROM pernode JOIN nation ON v = n_nationkey
      ORDER BY n_triangles DESC, nationkey
    """))

  /** Minimum hop distance from nation 0, 4 unrolled BFS rounds:
    * frontier ∪ (frontier → neighbours, +1 hop) → min per node.
    * Exact integer arithmetic throughout — no float anywhere. The
    * unrolled-rounds form is the driver-side twin of the CC fixpoint
    * loop (q_dedup_cluster); 4 rounds cover any diameter this graph
    * exhibits at every SF (observed diameter 2), and nodes
    * unreachable in 4 hops are deliberately absent from the result.
    */
  val khop = QueryDef(
    "q_khop",
    (s, d) => {
      val kept = keptEdges(s, d)
      val sym = kept.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(kept.select(col("b").as("src"), col("a").as("dst")))
      var dist = s.range(1).select(lit(0L).as("v"), lit(0L).as("hops"))
      for (_ <- 1 to 4) {
        dist = dist
          .unionAll(dist.join(sym, col("v") === col("src"))
            .select(col("dst").as("v"), (col("hops") + 1).as("hops")))
          .groupBy(col("v")).agg(min(col("hops")).as("hops"))
      }
      dist
        .join(Tables.nation(s, d), col("v") === col("n_nationkey"))
        .select(col("v").as("nationkey"), col("n_name").as("nation"), col("hops"))
        .orderBy(col("hops"), col("nationkey"))
    },
    Some(s"""
      WITH $keptCte,
      sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM kept
              UNION ALL SELECT b, a FROM kept),
      d0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS hops),
      d1 AS MATERIALIZED (SELECT v, CAST(min(hops) AS BIGINT) AS hops FROM (
        SELECT v, hops FROM d0
        UNION ALL SELECT dst AS v, hops + 1 FROM d0 JOIN sym ON v = src)
        GROUP BY v),
      d2 AS MATERIALIZED (SELECT v, CAST(min(hops) AS BIGINT) AS hops FROM (
        SELECT v, hops FROM d1
        UNION ALL SELECT dst AS v, hops + 1 FROM d1 JOIN sym ON v = src)
        GROUP BY v),
      d3 AS MATERIALIZED (SELECT v, CAST(min(hops) AS BIGINT) AS hops FROM (
        SELECT v, hops FROM d2
        UNION ALL SELECT dst AS v, hops + 1 FROM d2 JOIN sym ON v = src)
        GROUP BY v),
      d4 AS MATERIALIZED (SELECT v, CAST(min(hops) AS BIGINT) AS hops FROM (
        SELECT v, hops FROM d3
        UNION ALL SELECT dst AS v, hops + 1 FROM d3 JOIN sym ON v = src)
        GROUP BY v)
      SELECT v AS nationkey, n_name AS nation, hops
      FROM d4 JOIN nation ON v = n_nationkey
      ORDER BY hops, nationkey
    """))

  /** Bellman-Ford relaxation over the min-plus semiring: `rounds`
    * rounds of `dist(v) = min(dist(v), dist(u) + w(u,v))` from nation
    * 0, so the result after round k is EXACTLY the shortest distance
    * over paths of ≤ k EDGES. Factored out so the graded query and
    * the convergence pin in GraphsSpec share one definition.
    */
  private[graft] def weightedDistances(
      s: SparkSession, d: String, rounds: Int): DataFrame = {
    val kept = keptEdges(s, d)
    val sym = kept.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionAll(kept.select(col("b").as("src"), col("a").as("dst"), col("w")))
    var dist = s.range(1).select(lit(0L).as("v"), lit(0L).as("dist"))
    for (_ <- 1 to rounds) {
      dist = dist
        .unionAll(dist.join(sym, col("v") === col("src"))
          .select(col("dst").as("v"), (col("dist") + col("w")).as("dist")))
        .groupBy(col("v")).agg(min(col("dist")).as("dist"))
    }
    dist
  }

  /** Weighted shortest path from nation 0 — 4 unrolled Bellman-Ford
    * relaxation rounds (weightedDistances above). NOTE the metric
    * definition: round k is the shortest distance over paths of ≤ k
    * EDGES, which for WEIGHTED graphs is not automatically the true
    * shortest distance at k = hop diameter (a min-weight path may use
    * more edges than the hop-minimal one). 4 rounds is nevertheless
    * exact here, and that is PINNED, not assumed: GraphsSpec asserts
    * a 5th relaxation round changes nothing at sf0.001 and sf0.01 —
    * i.e. the computation has converged to the true fixed point, the
    * same convergence check a production run would loop on. The
    * hop-count twin is q_khop (same loop, `+1` in place of `+w`); all
    * arithmetic is exact bigint (edge weight = trade count), so min()
    * can never sit on a float boundary. Scale: identical contract to
    * q_khop — the one fact-sized job is the memoized edge
    * aggregation; every relaxation round joins a ≤|nations| frontier
    * against the ≤|nations|² checkpointed edge table, with the
    * convergence loop adding rounds only until a round is a no-op.
    */
  val shortestPath = QueryDef(
    "q_shortest_path",
    (s, d) => {
      weightedDistances(s, d, 4)
        .join(Tables.nation(s, d), col("v") === col("n_nationkey"))
        .select(col("v").as("nationkey"), col("n_name").as("nation"), col("dist"))
        .orderBy(col("dist"), col("nationkey"))
    },
    Some(s"""
      WITH $keptCte,
      sym AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM kept
              UNION ALL SELECT b, a, w FROM kept),
      p0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS dist),
      p1 AS MATERIALIZED (SELECT v, CAST(min(dist) AS BIGINT) AS dist FROM (
        SELECT v, dist FROM p0
        UNION ALL SELECT dst AS v, dist + w FROM p0 JOIN sym ON v = src)
        GROUP BY v),
      p2 AS MATERIALIZED (SELECT v, CAST(min(dist) AS BIGINT) AS dist FROM (
        SELECT v, dist FROM p1
        UNION ALL SELECT dst AS v, dist + w FROM p1 JOIN sym ON v = src)
        GROUP BY v),
      p3 AS MATERIALIZED (SELECT v, CAST(min(dist) AS BIGINT) AS dist FROM (
        SELECT v, dist FROM p2
        UNION ALL SELECT dst AS v, dist + w FROM p2 JOIN sym ON v = src)
        GROUP BY v),
      p4 AS MATERIALIZED (SELECT v, CAST(min(dist) AS BIGINT) AS dist FROM (
        SELECT v, dist FROM p3
        UNION ALL SELECT dst AS v, dist + w FROM p3 JOIN sym ON v = src)
        GROUP BY v)
      SELECT v AS nationkey, n_name AS nation, dist
      FROM p4 JOIN nation ON v = n_nationkey
      ORDER BY dist, nationkey
    """))

  /** Link prediction by neighborhood Jaccard: for every node pair
    * sharing at least one neighbor, |N(a)∩N(b)| / |N(a)∪N(b)| —
    * the classic "predict the missing edge" score. The pair
    * enumeration joins the symmetric adjacency list WITH ITSELF ON
    * THE SHARED NEIGHBOR (a < b canonicalization), so candidate work
    * is Σ per-node degree² — bucket-local on the shared-neighbor key,
    * never |V|² — the same contract as q_basket_affinity's
    * order-local pairing. Union size comes from inclusion-exclusion
    * over exact bigint degrees (deg(a) + deg(b) − common), no
    * distinct-union materialization. The division is the only float,
    * performed identically (bigint → IEEE double) in both engines at
    * output time; top-15 ties broken by (node_a, node_b).
    */
  val graphJaccard = QueryDef(
    "q_graph_jaccard",
    (s, d) => {
      val kept = keptEdges(s, d)
      val sym = kept.select(col("a").as("v"), col("b").as("n"))
        .unionAll(kept.select(col("b").as("v"), col("a").as("n")))
      val deg = sym.groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val pairs = sym.as("x")
        .join(sym.as("y"), col("x.n") === col("y.n") && col("x.v") < col("y.v"))
        .groupBy(col("x.v").as("node_a"), col("y.v").as("node_b"))
        .agg(count(lit(1)).as("common_neighbors"))
      // the prediction target is a NON-edge: flag pairs already linked
      // (kept is canonical a<b, same as the pair orientation)
      val linked = kept.select(col("a").as("node_a"), col("b").as("node_b"),
        lit(true).as("already_linked"))
      pairs
        .join(deg.select(col("v").as("node_a"), col("deg").as("deg_a")), Seq("node_a"))
        .join(deg.select(col("v").as("node_b"), col("deg").as("deg_b")), Seq("node_b"))
        .join(linked, Seq("node_a", "node_b"), "left")
        .select(col("node_a"), col("node_b"), col("common_neighbors"),
          round(col("common_neighbors").cast("double") /
            (col("deg_a") + col("deg_b") - col("common_neighbors")).cast("double"),
            4).as("jaccard"),
          coalesce(col("already_linked"), lit(false)).as("already_linked"))
        .orderBy(col("jaccard").desc, col("node_a"), col("node_b"))
        .limit(15)
    },
    Some(s"""
      WITH $keptCte,
      sym AS MATERIALIZED (SELECT a AS v, b AS n FROM kept
              UNION ALL SELECT b, a FROM kept),
      deg AS MATERIALIZED (SELECT v, count(*) AS deg FROM sym GROUP BY v),
      pairs AS MATERIALIZED (
        SELECT x.v AS node_a, y.v AS node_b, count(*) AS common_neighbors
        FROM sym x JOIN sym y ON x.n = y.n AND x.v < y.v
        GROUP BY 1, 2)
      SELECT node_a, node_b,
             CAST(common_neighbors AS BIGINT) AS common_neighbors,
             round(CAST(common_neighbors AS DOUBLE)
                   / CAST(da.deg + db.deg - common_neighbors AS DOUBLE), 4) AS jaccard,
             COALESCE(k.already_linked, false) AS already_linked
      FROM pairs
      JOIN deg da ON node_a = da.v
      JOIN deg db ON node_b = db.v
      LEFT JOIN (SELECT a AS node_a, b AS node_b, true AS already_linked
                 FROM kept) k USING (node_a, node_b)
      ORDER BY jaccard DESC, node_a, node_b
      LIMIT 15
    """))

  def defs: Seq[QueryDef] = Seq(triangles, khop, shortestPath, graphJaccard)
}
