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

  test("Memo.peek never re-runs a failed compute (poisoned holder reads as absent)") {
    // a Scala lazy val RETRIES a throwing initializer on the next
    // force — peek inside a cache-CLEAR path must not relaunch the
    // failed build (or rethrow and abort the remaining clears)
    val m = new Memo[String, String]
    var calls = 0
    intercept[RuntimeException] {
      m.get("k") { calls += 1; throw new RuntimeException("boom") }
    }
    assert(calls == 1)
    assert(m.peek("k").isEmpty, "poisoned holder must read as absent")
    assert(calls == 1, "peek re-ran the failed compute")
    // get() on the poisoned key retries the ORIGINAL thunk (lazy val
    // semantics) — remove() is the recovery path, then a fresh get
    // memoizes normally
    intercept[RuntimeException] { m.get("k")("never evaluated") }
    assert(calls == 2)
    m.remove("k")
    assert(m.get("k")("ok") == "ok")
    assert(m.peek("k").contains("ok"))
  }
}
