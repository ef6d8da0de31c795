package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JDBC source/sink against the Derby EMBEDDED driver that ships in
  * /opt/spark/jars (in-process, zero egress): round-trip fidelity,
  * filter pushdown into the generated SQL, and both parallel-read
  * strategies (numeric range split, predicate shards).
  */
class JdbcSourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  // Derby CLOBs (Spark's Derby dialect maps StringType to CLOB) have
  // no equality operator in some contexts; keep a numeric + varchar
  // mix by writing nation with its comment dropped.
  private lazy val nation = Tables.nation(spark, TestSpark.sf0001)
    .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))

  test("write + read round-trips exactly") {
    Sources.writeJdbc(nation, url, "nation_rt", driver)
    val back = Sources.jdbc(spark, url, "nation_rt", driver)
    assert(back.count() === nation.count())
    assert(back.select(nation.columns.map(col).toSeq: _*)
      .exceptAll(nation).isEmpty)
    assert(nation.exceptAll(back.select(nation.columns.map(col).toSeq: _*)).isEmpty)
  }

  test("filters push into the generated SQL (database-side reduction)") {
    Sources.writeJdbc(nation, url, "nation_push", driver)
    val probe = Sources.jdbc(spark, url, "nation_push", driver)
      .filter(col("n_nationkey") >= 10 && col("n_nationkey") < 15)
      .select(col("n_nationkey"), col("n_name"))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual") || plan.contains("n_nationkey")),
      s"filter not pushed to JDBC scan:\n${plan.take(1500)}")
    assert(probe.count() === 5)
  }

  test("partitioned read splits into numPartitions bounded queries, same rows") {
    Sources.writeJdbc(nation, url, "nation_part", driver)
    val par = Sources.jdbcPartitioned(spark, url, "nation_part", driver,
      partitionColumn = "n_nationkey", lowerBound = 0L, upperBound = 25L,
      numPartitions = 4)
    assert(par.rdd.getNumPartitions === 4)
    assert(par.select(nation.columns.map(col).toSeq: _*)
      .exceptAll(nation).isEmpty && par.count() === nation.count())
    // bounds shape parallelism, never correctness: rows OUTSIDE the
    // declared bounds still arrive via the unbounded edge slices
    val narrow = Sources.jdbcPartitioned(spark, url, "nation_part", driver,
      "n_nationkey", 5L, 10L, 3)
    assert(narrow.count() === nation.count())
  }

  test("predicate-sharded read: one task per shard, union of shards = table") {
    Sources.writeJdbc(nation, url, "nation_pred", driver)
    // predicates are raw dialect SQL: identifiers must be quoted as
    // stored (Spark writes quoted-lowercase; unquoted would upcase)
    val shards = Seq("\"n_regionkey\" < 2", "\"n_regionkey\" >= 2")
    val df = Sources.jdbcByPredicates(spark, url, "nation_pred", driver, shards)
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === nation.count())
    assert(df.select(nation.columns.map(col).toSeq: _*).exceptAll(nation).isEmpty)
  }

  test("append mode adds rows; overwrite resets") {
    Sources.writeJdbc(nation, url, "nation_mode", driver)
    Sources.writeJdbc(nation, url, "nation_mode", driver, mode = "append")
    assert(Sources.jdbc(spark, url, "nation_mode", driver).count()
      === 2 * nation.count())
    Sources.writeJdbc(nation, url, "nation_mode", driver, mode = "overwrite")
    assert(Sources.jdbc(spark, url, "nation_mode", driver).count()
      === nation.count())
  }
}
