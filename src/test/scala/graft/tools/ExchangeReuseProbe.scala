package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement tool (VERDICT r9 item 6 / NOTES open thread): the
  * banded-simhash self-join builds its band-exploded projection TWICE
  * from the checkpointed fingerprint (one Generate + Exchange per
  * branch). Two candidate shapes could pay the explode once:
  *
  *   A (current)  checkpoint fp, explode per branch;
  *   B            checkpoint the EXPLODED form (4× rows materialized,
  *                each branch only renames);
  *
  * plus the diagnostic question of whether ReusedExchange ever
  * unifies the two branch shuffles (precedent says no for
  * differently-projected uses — the minhash verify join measured the
  * same question in r1). Run:
  *   sbt "Test/runMain graft.tools.ExchangeReuseProbe <sfDir> [reps]"
  */
object ExchangeReuseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = mk
        df.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-12s min ${ts.min}%.2f s  (all ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    // ---- variant A: the shipped query (checkpoint fp, explode x2)
    // ---- variant B: checkpoint the exploded band table ------------
    def variantB(): DataFrame = {
      val fp = graft.queries.Dedup.simhashFp(spark, dir, 60)
      val exploded = fp
        .select(col("doc_id"), col("simhash60"),
          explode(array((0 until 4).map(b => struct(lit(b).as("band_id"),
            shiftright(col("simhash60"), 15 * b).bitwiseAND(lit(32767L))
              .as("band_val"))): _*)).as("bd"))
        .select(col("doc_id"), col("simhash60"),
          col("bd.band_id").as("band_id"), col("bd.band_val").as("band_val"))
        .localCheckpoint(false)
      def side(idCol: String, fpCol: String) = exploded.select(
        col("doc_id").as(idCol), col("simhash60").as(fpCol),
        col("band_id"), col("band_val"))
      side("doc1", "fp1")
        .join(side("doc2", "fp2"), Seq("band_id", "band_val"))
        .filter(col("doc1") < col("doc2"))
        .select(col("doc1"), col("doc2"), col("fp1"), col("fp2")).distinct()
        .filter(bit_count(col("fp1").bitwiseXOR(col("fp2"))) <= 3)
        .select(col("doc1"), col("doc2"),
          bit_count(col("fp1").bitwiseXOR(col("fp2"))).cast("long").as("hamming"))
        .orderBy(col("doc1"), col("doc2"))
    }
    // order: B first, then A, then B again — the first timed block
    // pays the page-cache/code-gen cold start, so each variant gets a
    // warm measurement and the cold bias is visible explicitly
    time("B-exploded")(variantB())
    time("A-current")(
      graft.SparkEntry.queries("q_dedup_simhash_banded")(spark, dir))
    time("B-again")(variantB())

    // ---- kNN: the same question for the keyed self-join -----------
    // the shipped q_knn_join derives `keyed` (embeddings ⋈ broadcast
    // chosenDims + bkey compute) once per branch; variant checkpoints
    // keyed so both branches read one materialization (n rows incl.
    // the 64-float embedding arrays — the storage-vs-recompute trade)
    def knnB(): DataFrame = {
      graft.functions.expressions.CosineSimilarity.register(spark)
      import org.apache.spark.sql.expressions.Window
      val e = graft.Tables.embeddings(spark, dir)
      def bitsOf(c: org.apache.spark.sql.Column) =
        (1 until 8).foldLeft(when(c <= 64, 0)) { (acc, k) =>
          acc.when(c <= (64L << k), k)
        }.otherwise(8)
      val cnt = e.groupBy(col("label"))
        .agg(count(lit(1)).as("n")).withColumn("bits", bitsOf(col("n")))
      val balance = e
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(sum(when(col("v") >= 0f, 1L).otherwise(0L)).as("pos"))
      val wDim = Window.partitionBy(col("label"))
        .orderBy(abs(lit(2) * col("pos") - col("n")), col("dim"))
      val chosenDims = balance.join(cnt, "label")
        .withColumn("dr", org.apache.spark.sql.functions.row_number().over(wDim))
        .filter(col("dr") <= col("bits"))
        .groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("dr"), col("dim")))),
          x => x.getField("dim")).as("ds"))
        .localCheckpoint(false)
      val keyed = e.join(broadcast(chosenDims), Seq("label"), "left")
        .withColumn("bkey", coalesce(
          array_join(transform(col("ds"),
            dm => when(element_at(col("embedding"), dm + 1) >= 0f, "1")
              .otherwise("0")), ""),
          lit("")))
        .select(col("vec_id"), col("label"), col("embedding"), col("bkey"))
        .localCheckpoint(false) // <- the variant: materialize keyed
      val w = Window.partitionBy(col("src_id"))
        .orderBy(col("cos").desc, col("nbr_id"))
      keyed.select(col("vec_id").as("src_id"), col("embedding").as("src_emb"),
          col("label"), col("bkey"))
        .join(keyed.select(col("vec_id").as("nbr_id"),
          col("embedding").as("nbr_emb"), col("label").as("nbr_label"),
          col("bkey").as("nbr_bkey")),
          col("label") === col("nbr_label") && col("bkey") === col("nbr_bkey")
            && col("src_id") =!= col("nbr_id"))
        .select(col("src_id"), col("nbr_id"),
          graft.functions.VectorFunctions.cosineFast(
            col("src_emb"), col("nbr_emb")).as("cos"))
        .withColumn("rank", org.apache.spark.sql.functions.row_number()
          .over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("src_id"), col("nbr_id"), col("rank"),
          round(col("cos"), 4).as("cosine"))
        .orderBy(col("src_id"), col("rank"))
    }
    time("knnB-keyed")(knnB())
    time("knnA-current")(
      graft.SparkEntry.queries("q_knn_join")(spark, dir))
    time("knnB-again")(knnB())

    // diagnostic: does ReusedExchange appear in either executed plan?
    for ((n, mk) <- Seq(
        "A" -> (() => graft.SparkEntry.queries("q_dedup_simhash_banded")(spark, dir)),
        "B" -> (() => variantB()))) {
      val df = mk(); df.count()
      val p = df.queryExecution.executedPlan.toString
      println(s"[probe] plan $n: ReusedExchange=" +
        "ReusedExchange".r.findAllIn(p).length +
        " Exchange=" + "Exchange \\(".r.findAllIn(p).length +
        " Generate=" + "Generate".r.findAllIn(p).length)
    }
    spark.stop()
  }
}
