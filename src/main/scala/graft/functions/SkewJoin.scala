package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew-salting for equi-joins (SCALING.md risk #1/#2 lever).
  * AQE's skew-join handles most cases automatically; this is the
  * explicit tool for extreme hot keys: the big (skewed) side gets a
  * uniform salt in [0, salts), the small side is replicated `salts`
  * times, and the join key becomes (key, salt) — splitting each hot
  * key's partition into `salts` pieces.
  *
  * Join results are identical to the unsalted join (verified in
  * StatefulSkewSpec); cost is `salts`× replication of the small side.
  */
object SkewJoin {

  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, seed: Long = 42L): DataFrame = {
    require(salts > 1)
    val salted = big.withColumn("__salt", (rand(seed) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
