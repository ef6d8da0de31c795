package graft

import graft.functions.KMeansLite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansLiteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("lloyd iterations reduce inertia on the real embeddings") {
    val points = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    val (_, a1) = KMeansLite.fit(points, k = 10, iterations = 1)
    val (_, a3) = KMeansLite.fit(points, k = 10, iterations = 3)
    val i1 = KMeansLite.inertia(a1)
    val i3 = KMeansLite.inertia(a3)
    assert(i3 < i1, s"inertia should improve: $i1 -> $i3")
    // every point assigned exactly once
    assert(a3.count() === points.count())
    assert(a3.select("vec_id").distinct().count() === points.count())
    // all clusters populated on this data
    assert(a3.select("cluster_id").distinct().count() === 10)
  }

  test("fit is deterministic across runs") {
    val points = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding")).limit(200)
    def sizes = KMeansLite.fit(points, k = 5, iterations = 2)._2
      .groupBy("cluster_id").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(sizes === sizes)
  }

  test("10 iterations stay fast: per-iteration localCheckpoint bounds the plan") {
    val points = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding")).limit(200)
    val t0 = System.nanoTime()
    val (_, assigned) = KMeansLite.fit(points, k = 5, iterations = 10)
    assert(assigned.count() === 200)
    // lineage is truncated each iteration, so the final plan is one
    // iteration deep, not ten: a LogicalRDD scan, no 10-deep join chain
    val plan = assigned.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("Scan ExistingRDD"),
      "expected checkpointed lineage in final plan:\n" + plan.take(1500))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 120.0, s"10 iterations took ${secs}s — lineage blowup?")
  }

  test("learned assignment improves q_ann_ivf-style probe quality vs labels") {
    // sanity: learned clusters agree with ground-truth labels far
    // better than chance (same-cluster pairs should mostly share label)
    val points = Tables.embeddings(spark, TestSpark.sf0001)
    val (_, assigned) = KMeansLite.fit(
      points.select(col("vec_id"), col("embedding")), k = 10, iterations = 3)
    val joined = assigned.join(points.select(col("vec_id"), col("label")), "vec_id")
    // dominant-label fraction per cluster, averaged
    val frac = joined.groupBy(col("cluster_id"), col("label")).count()
      .groupBy(col("cluster_id"))
      .agg((max(col("count")) / sum(col("count"))).as("purity"))
      .agg(avg(col("purity"))).head().getDouble(0)
    // this corpus's clusters barely separate (max within-label cosine
    // ~0.5), so absolute purity stays low — assert clearly above the
    // 1/k = 0.1 chance floor rather than a high bar the data can't meet
    assert(frac > 0.13, s"cluster purity vs labels not above chance: $frac")
  }
}
