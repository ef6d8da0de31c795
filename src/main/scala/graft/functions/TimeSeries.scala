package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Time-series operators whose recurrences Spark's window functions
  * cannot express (an EMA value depends on the previous EMA value,
  * not on a frame aggregate).
  *
  * Shape: groupByKey on the series key + a sorted fold inside each
  * group via flatMapGroups — one shuffle on the key, then linear
  * per-partition work with O(1) state per series, the same profile as
  * sessionization. Keys are independent, so 100 TB of series
  * parallelize across executors; a single giant series is the skew
  * case (same day-bucketing lever as sessionization).
  */
object TimeSeries {

  /** One EMA output row. */
  case class EmaPoint(series_id: Long, seq: Long, value: Double, ema: Double)

  /** Exponential moving average per series:
    * ema_0 = v_0; ema_i = alpha*v_i + (1-alpha)*ema_{i-1},
    * ordered by (orderCol, then idCol for total order). Input columns:
    * keyCol (long), idCol (long, unique), orderCol (sortable),
    * valueCol (double). Output rounded to 6 decimals.
    */
  def ema(df: DataFrame, alpha: Double, keyCol: String, idCol: String,
      orderCol: String, valueCol: String): Dataset[EmaPoint] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    implicit val outEnc = Encoders.product[EmaPoint]
    implicit val keyEnc = Encoders.scalaLong
    implicit val rowEnc = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    df.select(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(orderCol).cast("long"), col(valueCol).cast("double"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key: Long, it: Iterator[(Long, Long, Long, Double)]) =>
        // sort inside the group: (orderCol, idCol) gives a total order
        val rows = it.toArray.sortBy(r => (r._3, r._2))
        var e = 0.0
        var first = true
        rows.iterator.map { case (_, id, _, v) =>
          e = if (first) { first = false; v } else alpha * v + (1 - alpha) * e
          EmaPoint(key, id, v, math.round(e * 1e6) / 1e6)
        }
      }
  }
}
