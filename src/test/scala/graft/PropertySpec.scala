package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws over generated data (SURVEY.md §5.3), using raw
  * ScalaCheck generators with fixed seeds (no scalatestplus bridge —
  * it isn't in the offline dependency set). Generators mirror the
  * fixture domains (FIXTURES.md) so the laws also hold on the real
  * tables.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowGen = for {
    flag <- Gen.oneOf("N", "A", "R")
    qty <- Gen.choose(1, 50)
    price <- Gen.choose(100.0, 10000.0)
  } yield (flag, qty, price)

  private val rowsGen = Gen.listOfN(60, rowGen)

  /** Deterministic samples: one per seed. */
  private def samples(n: Int): Seq[List[(String, Int, Double)]] =
    (1 to n).map(i => rowsGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("count(a union all b) == count(a) + count(b)") {
    for (Seq(a, b) <- samples(6).grouped(2)) {
      val da = a.toDF("flag", "qty", "price")
      val db = b.toDF("flag", "qty", "price")
      assert(da.unionAll(db).count() === da.count() + db.count())
    }
  }

  test("filter commutes with projection") {
    for (rows <- samples(3)) {
      val df = rows.toDF("flag", "qty", "price")
      val l = df.filter($"qty" > 25).select($"flag", $"qty")
        .collect().toSeq.sortBy(_.toString)
      val r = df.select($"flag", $"qty").filter($"qty" > 25)
        .collect().toSeq.sortBy(_.toString)
      assert(l === r)
    }
  }

  test("sum of group sums equals global sum (integer domain)") {
    for (rows <- samples(3)) {
      val df = rows.toDF("flag", "qty", "price")
      val grouped = df.groupBy($"flag").agg(sum($"qty").as("s"))
        .agg(sum($"s")).head().getLong(0)
      val global = df.agg(sum($"qty")).head().getLong(0)
      assert(grouped === global)
    }
  }

  test("row_number over a partition is a permutation of 1..n") {
    for (rows <- samples(3)) {
      val df = rows.zipWithIndex
        .map { case ((f, q, p), i) => (f, q, p, i.toLong) }
        .toDF("flag", "qty", "price", "id")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"flag").orderBy($"qty", $"id")
      val bad = df.withColumn("rn", row_number().over(w))
        .groupBy($"flag")
        .agg(count(lit(1)).as("n"), sum($"rn").as("s"))
        .filter($"s" =!= $"n" * ($"n" + 1) / 2)
        .count()
      assert(bad === 0)
    }
  }

  test("dropDuplicates is idempotent and bounded by distinct key count") {
    for (rows <- samples(3)) {
      val df = rows.toDF("flag", "qty", "price")
      val once = df.dropDuplicates(Seq("flag", "qty"))
      assert(once.count() === once.dropDuplicates(Seq("flag", "qty")).count())
      assert(once.count() === df.select($"flag", $"qty").distinct().count())
    }
  }

  private val intervalGen = for {
    lo <- Gen.choose(0.0, 9000.0)
    span <- Gen.choose(1.0, 2500.0)
    id <- Gen.choose(0L, 1000000L)
  } yield (id, lo, lo + span)

  test("bucketed range join equals naive join for random intervals and widths") {
    import graft.functions.RangeJoin
    for (seed <- 1 to 3) {
      val pts = Gen.listOfN(80, Gen.choose(0.0, 12000.0))
        .pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("pid", "v")
      val ivs = Gen.listOfN(30, intervalGen)
        .pureApply(Gen.Parameters.default, Seed(seed.toLong + 100))
        .toDF("iid", "lo", "hi")
      for (width <- Seq(97.0, 1000.0, 5000.0)) {
        val naive = pts.join(ivs, $"v" >= $"lo" && $"v" <= $"hi")
          .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val bucketed = RangeJoin.bucketed(pts, ivs, "v", "lo", "hi", width)
          .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(bucketed === naive, s"seed=$seed width=$width")
      }
    }
  }

  test("LSH bucket assignment is invariant to corpus partitioning") {
    import graft.functions.LshAnn
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"))
    def buckets(df: org.apache.spark.sql.DataFrame) =
      LshAnn.bucketize(df, LshAnn.planesFrom(emb, 100, 8), 8)
        .select($"vec_id", $"bucket")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(buckets(emb) === buckets(emb.repartition(13)))
  }

  /** Misra-Gries laws on generated streams, checked WITHOUT Spark
    * (the Aggregator's reduce/merge are pure): any split of a stream
    * into partial sketches that are then merged must (a) keep at most
    * k counters, (b) never overcount, (c) undercount each item by at
    * most total/(k+1) — the mergeable-summaries contract that makes
    * partial+final aggregation safe at any partitioning.
    */
  test("Misra-Gries reduce/merge laws hold on generated streams") {
    import graft.functions.HeavyHitters
    val hh = new HeavyHitters(5)
    val itemGen = Gen.frequency(
      (8, Gen.const("hot")), (4, Gen.const("warm")),
      (1, Gen.oneOf("a", "b", "c", "d", "e", "f", "g")))
    val streamGen = Gen.listOfN(400, itemGen)
    for (seed <- 1 to 8) {
      val stream = streamGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val bound = stream.size / 6 // n/(k+1), k=5
      // split at a seed-dependent point, sketch each half, merge
      val cut = 50 + (seed * 37) % 300
      val (s1, s2) = stream.splitAt(cut)
      val merged = hh.merge(
        s1.foldLeft(hh.zero)(hh.reduce),
        s2.foldLeft(hh.zero)(hh.reduce))
      assert(merged.size <= 5)
      merged.foreach { case (item, c) =>
        val truth = exact.getOrElse(item, 0L)
        assert(c <= truth, s"seed=$seed $item overcounted")
        assert(truth - c <= bound, s"seed=$seed $item past bound")
      }
      val guaranteed = exact.filter(_._2 > bound).keySet
      assert(guaranteed.subsetOf(merged.keySet), s"seed=$seed lost $guaranteed")
    }
  }

  /** PrefixSum's distributed rank/cumsum against the sequential
    * reference computed in plain Scala — generated data with heavy
    * duplicate keys, random group counts, and random input
    * partitioning, so tie truncation and boundary placement are both
    * exercised away from the curated fixtures.
    */
  test("PrefixSum rank/cumsum equal the sequential reference on generated data") {
    import graft.functions.PrefixSum
    val rowGen2 = for {
      g <- Gen.choose(0, 2)
      k <- Gen.choose(0, 15) // 16 distinct keys over ~80 rows → dense ties
      v <- Gen.choose(-50L, 50L)
    } yield (s"g$g", k.toLong, v)
    for (seed <- 1 to 5) {
      val rows = Gen.listOfN(80, rowGen2)
        .pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .zipWithIndex.map { case ((g, k, v), i) => (g, k, i.toLong, v) }
      val parts = 1 + seed % 7
      val df = rows.toDF("g", "k", "tb", "v").repartition(parts)
      val out = PrefixSum.attach(df, Seq("g"), Seq(col("k"), col("tb")),
          rank = Some("rk"), sums = Seq("v" -> "cs"))
        .select($"g", $"tb", $"rk", $"cs")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // sequential reference: per group, sort by (k, tb), running sum
      rows.groupBy(_._1).foreach { case (g, grp) =>
        var cum = 0L
        grp.sortBy(t => (t._2, t._3)).zipWithIndex.foreach { case ((_, _, tb, v), i) =>
          cum += v
          assert(out((g, tb)) === ((i + 1L, cum)),
            s"seed=$seed parts=$parts g=$g tb=$tb")
        }
      }
    }
  }
}
