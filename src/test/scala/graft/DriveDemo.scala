package graft

import org.apache.spark.sql.SparkSession

/** Manual drive of the non-graded library surfaces (streaming twins,
  * multimodal pipeline, sources) through their public API:
  * `sbt "Test/runMain graft.DriveDemo"`.
  */
object DriveDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts (Tables.events)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"

    val ev = Tables.events(spark, sf)
    println(s"[demo] tumblingCounts rows: ${streaming.EventStreams.tumblingCounts(ev).count()}")
    println(s"[demo] slidingCounts rows: ${streaming.EventStreams.slidingCounts(ev).count()}")
    println(s"[demo] sessionCounts rows: ${streaming.EventStreams.sessionCounts(ev).count()}")
    println(s"[demo] dedupEvents rows: ${streaming.EventStreams.dedupEvents(ev).count()}")

    val docs = Tables.documents(spark, sf).limit(10)
    val withBin = multimodal.BinaryPipeline.withPayload(docs, "text")
    multimodal.BinaryPipeline.decodeMeta(withBin).show(3, truncate = false)
    println(s"[demo] frames: ${multimodal.BinaryPipeline.sampleFrames(withBin, 4, 16).count()}")

    spark.stop()
  }
}
