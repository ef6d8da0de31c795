package graft

import java.sql.{DriverManager, Timestamp}

import graft.sources.Sources
import graft.streaming.Event
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream → relational database: foreachBatch + the JDBC sink drains
  * a stream into Derby with per-batch key dedup and delete-then-insert
  * upsert semantics, so at-least-once redelivery converges to
  * exactly-once table contents — the streaming twin of
  * ForeachBatchUpsertSpec with a database instead of parquet as the
  * serving store (the common "stream the aggregates into the app DB"
  * deployment).
  */
class StreamingJdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private val url = "jdbc:derby:memory:graftstream;create=true"

  private def t(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  /** Delete-then-insert upsert for one micro-batch (one transaction
    * per partition is Spark's JDBC write contract; the delete runs
    * first on the batch's key set via a driver-side statement —
    * batch-key-sized, not table-sized).
    */
  private def upsertBatch(batch: DataFrame, table: String): Unit = {
    val deduped = batch
      .withColumn("rn", row_number().over(Window.partitionBy(col("event_id"))
        .orderBy(col("ts").desc, col("value").desc)))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint() // pin: the delete below must match THIS content
    val keys = deduped.select(col("event_id")).collect().map(_.getLong(0))
    if (keys.nonEmpty) {
      val conn = DriverManager.getConnection(url)
      try {
        val exists = conn.getMetaData
          .getTables(null, null, null, Array("TABLE"))
        var found = false
        while (exists.next()) {
          if (exists.getString("TABLE_NAME").equalsIgnoreCase(table)) found = true
        }
        if (found) {
          // Spark's JDBC writer creates the TABLE name unquoted (the
          // database upcases it) but quotes COLUMN names — raw SQL
          // against the written table must follow the same split
          val st = conn.createStatement()
          try { st.executeUpdate(
            s"""DELETE FROM $table WHERE "event_id" IN (${keys.mkString(",")})""")
          } finally st.close()
        }
      } finally conn.close()
    }
    Sources.writeJdbc(deduped, url, table, driver, mode = "append")
  }

  test("foreachBatch + JDBC upsert converges redelivered events to exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // create the serving table up front (empty overwrite): the
    // deployment step a streaming job assumes exists, and it keeps
    // every micro-batch on the uniform delete+append path
    Sources.writeJdbc(Seq.empty[Event].toDF(), url, "stream_events", driver)
    val input = MemoryStream[Event]
    val q = input.toDS().toDF()
      .writeStream
      .foreachBatch((batch: DataFrame, _: Long) => upsertBatch(batch, "stream_events"))
      .start()
    try {
      input.addData(
        Event(1, t(1), 1, "click", 10.0),
        Event(2, t(2), 1, "view", 20.0))
      q.processAllAvailable()
      // redeliver event 2 (same content) + event 2 newer value + new 3
      input.addData(
        Event(2, t(2), 1, "view", 20.0),
        Event(2, t(5), 1, "view", 25.0),
        Event(3, t(3), 2, "click", 30.0))
      q.processAllAvailable()
    } finally q.stop()

    val table = Sources.jdbc(spark, url, "stream_events", driver)
    assert(table.count() === 3, "redelivery must not duplicate rows")
    val byId = table.collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("value")).toMap
    assert(byId === Map(1L -> 10.0, 2L -> 25.0, 3L -> 30.0),
      "latest value per key must win")
  }
}
