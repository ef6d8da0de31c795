package graft

/** Dev tool: probe Spark 4.1 SQL surface availability (regr_*,
  * LATERAL, WITH RECURSIVE) before committing query designs.
  */
object FeatureProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq((1.0, 2.0), (2.0, 4.1), (3.0, 5.9)).toDF("x", "y").createOrReplaceTempView("t")
    def tryQ(label: String, sql: String): Unit =
      try {
        val r = spark.sql(sql).collect().mkString("; ")
        println(s"[feat] OK   $label -> $r")
      } catch { case e: Throwable =>
        println(s"[feat] FAIL $label -> ${e.getMessage.take(140)}")
      }
    tryQ("regr", "SELECT regr_slope(y, x) s, regr_intercept(y, x) i, regr_r2(y, x) r2, regr_count(y, x) n FROM t")
    tryQ("lateral", "SELECT t.x, l.v FROM t, LATERAL (SELECT t.x * 2 AS v) l")
    tryQ("lateral_explode", "SELECT t.x, e.col FROM t JOIN LATERAL explode(array(t.x, t.y)) e")
    tryQ("recursive", "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 5) SELECT sum(n) FROM r")
    tryQ("qualify-like", "SELECT x FROM t QUALIFY row_number() OVER (ORDER BY x) = 1")
    tryQ("variant", "SELECT variant_get(parse_json('{\"k\": 42, \"s\": \"hi\"}'), '$.k', 'bigint') v, " +
      "variant_get(parse_json('{\"k\": 42, \"s\": \"hi\"}'), '$.s', 'string') s2")
    tryQ("variant_typeof", "SELECT schema_of_variant(parse_json('{\"k\": 42}')) t2, " +
      "is_variant_null(try_parse_json('nope')) n")
    tryQ("observe", "SELECT 1") // placeholder; observe() probed via API if needed
    tryQ("window_median", "SELECT x, median(y) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) m FROM t")
    tryQ("window_percentile", "SELECT x, percentile(y, 0.5) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) m FROM t")
    spark.stop()
  }
}
