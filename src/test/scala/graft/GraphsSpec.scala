package graft

import graft.queries.Graphs
import org.scalatest.funsuite.AnyFunSuite

/** Convergence pin for q_shortest_path (ADVICE r7): the graded query
  * unrolls 4 Bellman-Ford relaxation rounds, and its Scaladoc claims
  * that is the true weighted-shortest-path fixed point, not just the
  * ≤4-edge truncation (which for weighted graphs can differ — a
  * min-weight path may use more edges than the hop diameter). Proof
  * obligation: a 5th round changes NOTHING at each tested SF. This is
  * exactly the `ΔF = ∅` stopping condition a production convergence
  * loop would evaluate per round; here it is pinned as a test so the
  * fixed unroll stays honest if the corpus changes.
  */
class GraphsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def settled(sf: String): Unit = {
    val r4 = Graphs.weightedDistances(spark, sf, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val r5 = Graphs.weightedDistances(spark, sf, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(r4.nonEmpty, "distance table is empty — probe is vacuous")
    assert(r4 == r5, s"a 5th relaxation round changed distances at $sf — " +
      "the 4-round unroll is a truncation, not the fixed point")
  }

  test("weighted shortest paths converge by round 4 at sf0.001") {
    settled(TestSpark.sf0001)
  }

  test("weighted shortest paths converge by round 4 at sf0.01") {
    settled(TestSpark.sf001)
  }
}
