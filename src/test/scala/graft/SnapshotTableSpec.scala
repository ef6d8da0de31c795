package graft

import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SnapshotTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("commits are versioned; time travel reads exact old snapshots") {
    val root = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val base = Tables.nation(spark, TestSpark.sf0001)

    assert(SnapshotTable.currentVersion(root) === 0)
    val v1 = SnapshotTable.commit(spark, root, base)
    assert(v1 === 1)
    val v2 = SnapshotTable.commit(spark, root,
      base.withColumn("n_name", upper(col("n_name"))))
    assert(v2 === 2 && SnapshotTable.currentVersion(root) === 2)

    // latest sees the transformed data
    val latest = SnapshotTable.read(spark, root)
    assert(latest.filter(col("n_name") === upper(col("n_name"))).count()
      === base.count())
    // time travel reproduces version 1 exactly (full-row equality)
    val old = SnapshotTable.read(spark, root, version = 1)
    assert(old.exceptAll(base).isEmpty && base.exceptAll(old).isEmpty)
  }

  test("old versions are immutable across later commits (byte-identical)") {
    val root = java.nio.file.Files.createTempDirectory("graft-snap2").toString
    SnapshotTable.commit(spark, root, Tables.region(spark, TestSpark.sf0001))
    def bytesOfV1: Map[String, Long] = {
      val dir = java.nio.file.Paths.get(root, "v=1")
      val out = scala.collection.mutable.Map[String, Long]()
      val walk = java.nio.file.Files.walk(dir)
      try walk.forEach { p =>
        if (java.nio.file.Files.isRegularFile(p))
          out(dir.relativize(p).toString) = java.nio.file.Files.size(p)
      } finally walk.close()
      out.toMap
    }
    val before = bytesOfV1
    SnapshotTable.commit(spark, root,
      Tables.region(spark, TestSpark.sf0001).limit(2))
    SnapshotTable.commit(spark, root,
      Tables.region(spark, TestSpark.sf0001).limit(1))
    assert(bytesOfV1 === before, "v=1 files changed after later commits")
    assert(SnapshotTable.read(spark, root).count() === 1)
    assert(SnapshotTable.read(spark, root, version = 2).count() === 2)
  }

  test("vacuum drops old versions but never the retained window") {
    val root = java.nio.file.Files.createTempDirectory("graft-snap3").toString
    val r = Tables.region(spark, TestSpark.sf0001)
    (1 to 4).foreach(i => SnapshotTable.commit(spark, root, r.limit(i)))
    val dropped = SnapshotTable.vacuum(root, keepLast = 2)
    assert(dropped === Seq(1, 2))
    // retained versions still readable; vacuumed one fails loudly
    assert(SnapshotTable.read(spark, root, version = 3).count() === 3)
    assert(SnapshotTable.read(spark, root, version = 4).count() === 4)
    val err = intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, root, version = 1)
    }
    assert(err.getMessage.contains("vacuumed or never committed"))
  }
}
