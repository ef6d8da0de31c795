package graft

import graft.queries.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Pins the adaptive-band-width threshold chain of
  * q_dedup_simhash_adaptive at its power-of-two boundaries — the
  * drift-sensitive contract: the Spark side computes w in Scala from
  * documents.count() while the oracle computes it as a generated SQL
  * CASE on count(*); both must flip at EXACTLY the same counts or
  * the engines fingerprint at different widths and every pair hash
  * diverges. (r9 lesson: float log2 at a power-of-two boundary can
  * flip between engines; integer threshold chains cannot — provided
  * the chains agree, which is what this spec pins.)
  */
class SimhashAdaptiveSpec extends AnyFunSuite {

  test("band-width chain boundaries: smallest w in [9,32] with n <= 2^(w+1)") {
    // clamp floor: anything up to 2^10 is the 9-bit minimum
    assert(Dedup.adaptiveBandBits(0) === 9)
    assert(Dedup.adaptiveBandBits(1) === 9)
    assert(Dedup.adaptiveBandBits(1024) === 9)
    // every interior boundary flips at exactly 2^(w+1) + 1
    for (w <- 10 to 31) {
      assert(Dedup.adaptiveBandBits(1L << w) === w - 1,
        s"n=2^$w should still be width ${w - 1}")
      assert(Dedup.adaptiveBandBits((1L << w) + 1) === w,
        s"n=2^$w+1 should flip to width $w")
    }
    // clamp ceiling: beyond 2^32 the chain saturates at 32 — the md5
    // hex width; occupancy <= 2 holds through 2^33 ~ 8.6B docs (the
    // 100 TB design point at ~10 KB/doc)
    assert(Dedup.adaptiveBandBits(1L << 32) === 31)
    assert(Dedup.adaptiveBandBits((1L << 32) + 1) === 32)
    assert(Dedup.adaptiveBandBits(1L << 33) === 32)
    assert(Dedup.adaptiveBandBits(Long.MaxValue) === 32)
    // the corpus points this round actually measured
    assert(Dedup.adaptiveBandBits(500) === 9)    // sf0.001 / sf0.01
    assert(Dedup.adaptiveBandBits(5000) === 12)  // sf0.1
    assert(Dedup.adaptiveBandBits(50000) === 15) // sf1 (= fixed banded)
    assert(Dedup.adaptiveBandBits(130000) === 16) // sf26 (2^17 = 131072 covers it)
  }

  test("the generated oracle CASE carries the identical thresholds") {
    val sql = SparkEntry.oracleSql("q_dedup_simhash_adaptive")
    for (w <- 9 until 32)
      assert(sql.contains(s"WHEN count(*) <= ${1L << (w + 1)} THEN $w"),
        s"oracle CASE is missing the w=$w threshold")
    assert(sql.contains("ELSE 32"))
  }
}
