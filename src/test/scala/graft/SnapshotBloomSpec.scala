package graft

import graft.sources.{BloomSidecar, SnapshotTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-filter file skipping on SnapshotTable — the high-cardinality
  * complement of the value-set sidecar: files whose distinct count
  * overflows the set cap still prune point probes through a
  * fixed-size per-(file, column) bloom with NO false negatives.
  * Pruning must stay an optimization: every probe's result is
  * identical to the unpruned filter, for present and absent keys,
  * across commit paths (flat commit, partition-sliced fast path).
  */
class SnapshotBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-bloom-$tag").toString

  test("bloom kernel: sizing, no false negatives, bounded false positives") {
    val (m, k) = BloomSidecar.size(10000, 0.01)
    assert(m % 64 == 0 && m >= 10000 * 9 && k >= 5 && k <= 16)
    val bits = new Array[Long](m / 64)
    val present = (0 until 10000).map(i => s"key-$i")
    present.foreach(v => BloomSidecar.add(bits, m, k, v))
    // no false negatives — structural property, checked exhaustively
    assert(present.forall(v => BloomSidecar.mightContain(bits, m, k, v)))
    // realized fpp within ~3x of the request on a disjoint probe set
    val fp = (0 until 10000).count(i =>
      BloomSidecar.mightContain(bits, m, k, s"absent-$i"))
    assert(fp < 300, s"false-positive rate too high: $fp/10000")
    // round trip through the sidecar payload encoding
    val Some((m2, k2, bits2)) = BloomSidecar.decode(BloomSidecar.encode(bits, m, k))
    assert(m2 == m && k2 == k && bits2.sameElements(bits))
    assert(BloomSidecar.decode("garbage").isEmpty)
    assert(BloomSidecar.decode("64:1:AAA").isEmpty) // wrong byte length
  }

  test("over-cap column: sets alone keep everything, bloom prunes, results identical") {
    val root = freshRoot("overflow")
    // orderkey is high-cardinality: with setCap=4 every file overflows
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .repartition(8, col("o_orderkey"))
    SnapshotTable.commit(spark, root, orders,
      setCols = Seq("o_orderkey"), setCap = 4,
      bloomCols = Seq("o_orderkey"))

    val keys = Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderkey").distinct().limit(50)
      .collect().map(_.getLong(0))
    var totalKept = 0
    keys.foreach { key =>
      val kept = SnapshotTable.pruneFilesEq(spark, root, "o_orderkey", key.toString)
      assert(kept.nonEmpty, s"bloom false negative for $key — forbidden")
      totalKept += kept.size
      val point = SnapshotTable.readPoint(spark, root, "o_orderkey", key.toString)
      val full = SnapshotTable.read(spark, root).filter(col("o_orderkey") === key)
      assert(point.exceptAll(full).isEmpty && full.exceptAll(point).isEmpty,
        s"pruned probe diverged for $key")
    }
    // hash-partitioned: each key lives in 1 file; fpp=1% over 8 files
    // leaves the average kept-count near 1, far below "all 8"
    assert(totalKept < keys.length * 3,
      s"bloom pruned nothing: kept $totalKept files for ${keys.length} probes")
    // an absent key prunes every file (sets say OVERFLOW, bloom says no)
    val miss = SnapshotTable.pruneFilesEq(spark, root, "o_orderkey", "999999999")
    assert(miss.size < 8, "absent key kept every file — bloom not consulted")
  }

  test("bloom-only table (no sets sidecar) prunes point probes") {
    val root = freshRoot("bloomonly")
    SnapshotTable.commit(spark, root,
      Tables.customer(spark, TestSpark.sf0001).repartition(6, col("c_custkey")),
      bloomCols = Seq("c_custkey"))
    val key = Tables.customer(spark, TestSpark.sf0001)
      .agg(min("c_custkey")).head().getLong(0)
    val kept = SnapshotTable.pruneFilesEq(spark, root, "c_custkey", key.toString)
    assert(kept.nonEmpty && kept.size < 6)
    val point = SnapshotTable.readPoint(spark, root, "c_custkey", key.toString)
    val full = SnapshotTable.read(spark, root).filter(col("c_custkey") === key)
    assert(point.exceptAll(full).isEmpty && full.exceptAll(point).isEmpty)
  }

  test("partition-sliced commits carry kept files' blooms and scan only the slice") {
    import spark.implicits._
    val root = freshRoot("carry")
    val v1 = (1L to 400L).map(i => (i % 4, i, s"val-$i")).toDF("p", "id", "s")
    SnapshotTable.commitPartitions(spark, root, v1, "p",
      bloomCols = Seq("id"))
    // rewrite ONLY partition 2 with new ids; partitions 0,1,3 carry
    val v2 = (1000L to 1100L).map(i => (2L, i, s"val-$i")).toDF("p", "id", "s")
    SnapshotTable.commitPartitions(spark, root, v2, "p",
      readVersion = 1, bloomCols = Seq("id"))

    // an id from an untouched partition reads through its CARRIED bloom
    val kept1 = SnapshotTable.pruneFilesEq(spark, root, "id", "5")
    assert(kept1.nonEmpty, "carried bloom lost id=5 (false negative)")
    assert(SnapshotTable.readPoint(spark, root, "id", "5").count() == 1)
    // the new slice's ids resolve through the FRESH bloom
    assert(SnapshotTable.readPoint(spark, root, "id", "1050").count() == 1)
    // partition 2's OLD ids (2, 6, ...) are gone with the rewrite
    assert(SnapshotTable.readPoint(spark, root, "id", "2").count() == 0)
    // pruning effectiveness survives the carry: a single id keeps few files
    val keptNew = SnapshotTable.pruneFilesEq(spark, root, "id", "1050")
    assert(keptNew.size <= 2, s"carried table stopped pruning: ${keptNew.size}")
  }

  test("deleting the bloom sidecar only widens reads, never changes results") {
    val root = freshRoot("advisory")
    SnapshotTable.commit(spark, root,
      Tables.nation(spark, TestSpark.sf0001).repartition(4, col("n_nationkey")),
      bloomCols = Seq("n_nationkey"))
    val before = SnapshotTable.readPoint(spark, root, "n_nationkey", "7").collect()
    val v = SnapshotTable.currentVersion(root)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, s"v=$v", "_bloom.json"))
    val after = SnapshotTable.readPoint(spark, root, "n_nationkey", "7").collect()
    assert(before.toSeq == after.toSeq)
    // without the sidecar every file is kept — pruning was optional
    assert(SnapshotTable.pruneFilesEq(spark, root, "n_nationkey", "7").size == 4)
  }
}
