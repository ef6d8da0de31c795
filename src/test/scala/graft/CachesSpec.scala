package graft

import org.scalatest.funsuite.AnyFunSuite

/** Graft.clearCaches: dropping every per-(session, dataset) memo —
  * table relations, eventsByDate layout, LSH signature/pair
  * checkpoints, graph edge table — must be invisible to results: a
  * cleared session re-derives each artifact identically. This is the
  * long-lived-service contract (VERDICT r5 #7): the memos bound a
  * Verify/Bench run's rework, not a service's memory.
  */
class CachesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  /** One query per memo family: verified-pair checkpoint (Dedup),
    * edge-table checkpoint (Graphs), eventsByDate layout (Tables —
    * q_events_pruned actually consumes Tables.eventsByDate, so the
    * clear→rewrite→re-read path of the partitioned layout is pinned;
    * q_sessionize covers the flat events relation), plain relation
    * memo (any TPC-H query).
    */
  private val probes =
    Seq("q_dedup_minhash", "q_triangles", "q_sessionize",
      "q_events_pruned", "q_pricing_summary")

  private def snapshot(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf)
      .collect().map(_.toString).sorted.toSeq

  test("a cleared session re-derives every memoized artifact identically") {
    val before = probes.map(n => n -> snapshot(n)).toMap
    Graft.clearCaches()
    val after = probes.map(n => n -> snapshot(n)).toMap
    probes.foreach { n =>
      assert(after(n) == before(n), s"$n diverged across clearCaches()")
      assert(before(n).nonEmpty, s"$n returned no rows — probe is vacuous")
    }
  }

  test("clearCaches is idempotent and safe on an empty cache state") {
    Graft.clearCaches()
    Graft.clearCaches() // second clear: no throw
    assert(snapshot("q_pricing_summary").nonEmpty)
  }
}
