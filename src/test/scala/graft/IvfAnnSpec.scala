package graft

import graft.functions.{IvfAnn, KMeansLite, VectorFunctions => VF}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** nprobe is IVF's recall/cost lever: widening the probe set must
  * increase (or hold) recall against brute force while scanning more
  * candidates. Runs on the real fixture embeddings over a KMeansLite
  * quantizer.
  */
class IvfAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val points = Tables.embeddings(spark, TestSpark.sf0001)
    .select(col("vec_id"), col("embedding"))

  private lazy val (centroids, assigned) =
    KMeansLite.fit(points, k = 10, iterations = 3)

  private lazy val bruteTop10 = {
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("cand_id"))
    points.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
      .crossJoin(points.select(col("vec_id").as("cand_id"), col("embedding").as("cand_emb")))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        VF.cosine(col("probe_emb"), col("cand_emb")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("probe_id"), col("cand_id"))
      .localCheckpoint()
  }

  /** recall@10 of IVF top-1 and the candidate count at an nprobe. */
  private def recallAndWork(nprobe: Int): (Double, Long) = {
    val queries = points.filter(col("vec_id") < 20)
    val corpus = assigned.select(col("vec_id"), col("embedding"), col("cluster_id"))
    val top1 = IvfAnn.search(queries, corpus, centroids, nprobe, k = 1)
      .select(col("query_id").as("probe_id"), col("cand_id"))
    val hits = top1.join(bruteTop10, Seq("probe_id", "cand_id")).count()
    val n = top1.count()
    assert(n > 0)
    val candidates = IvfAnn.probeClusters(queries, centroids, nprobe)
      .join(corpus.select(col("cluster_id")), Seq("cluster_id")).count()
    (hits.toDouble / n, candidates)
  }

  test("IvfAnn.search output column contract") {
    val out = IvfAnn.search(points.filter(col("vec_id") < 3),
      assigned.select(col("vec_id"), col("embedding"), col("cluster_id")),
      centroids, nprobe = 1, k = 3)
    assert(out.columns.toSeq === Seq("query_id", "cand_id", "rank"))
    assert(out.count() > 0)
  }

  test("wider nprobe trades candidate volume for recall") {
    val (r1, w1) = recallAndWork(1)
    val (r3, w3) = recallAndWork(3)
    assert(w3 > w1, s"nprobe=3 must scan more candidates: $w1 vs $w3")
    assert(r3 >= r1, s"recall must not drop when probing wider: $r1 -> $r3")
    assert(r3 >= 0.4, s"nprobe=3 recall@10 collapsed: $r3")
  }

  /** The fixture embeddings' labels are well-separated, which flatters
    * IVF (a probe's true neighbors rarely live in a non-probed
    * cluster). This fixture is built to be ADVERSARIAL: 10 cluster
    * centers whose spread is comparable to the per-point noise, so
    * clusters overlap heavily and true top-10 neighbors routinely sit
    * across cluster boundaries — the regime where nprobe actually
    * earns its keep.
    */
  test("overlapping-cluster fixture: recall@10 floor at the graded nprobe, monotone curve") {
    val rnd = new scala.util.Random(7) // fixed seed — deterministic fixture
    val dim = 16
    val centers = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = (0 until 600).map { i =>
      val c = centers(i % 10)
      val emb = c.map(v => (v + rnd.nextGaussian() * 1.2).toFloat).toSeq
      (i.toLong, emb)
    }
    import spark.implicits._
    val pts = rows.toDF("vec_id", "embedding").localCheckpoint()
    val (ctr, asg) = KMeansLite.fit(pts, k = 10, iterations = 5)
    val corpus = asg.select(col("vec_id"), col("embedding"), col("cluster_id"))
      .localCheckpoint()
    val queries = pts.filter(col("vec_id") < 30)
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("cand_id"))
    val brute = queries
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
      .crossJoin(pts.select(col("vec_id").as("cand_id"), col("embedding").as("cand_emb")))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        VF.cosine(col("probe_emb"), col("cand_emb")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("probe_id").as("query_id"), col("cand_id"))
      .localCheckpoint()
    val denom = brute.count().toDouble
    def recallAt(nprobe: Int): Double = {
      val ivf = IvfAnn.search(queries, corpus, ctr, nprobe, k = 10)
        .select(col("query_id"), col("cand_id"))
      ivf.join(brute, Seq("query_id", "cand_id")).count() / denom
    }
    val curve = Seq(1, 2, 3, 5).map(np => np -> recallAt(np))
    info("recall@10 by nprobe (overlapping clusters): " +
      curve.map { case (np, r) => f"$np->$r%.3f" }.mkString(", "))
    curve.sliding(2).foreach { case Seq((npA, rA), (npB, rB)) =>
      assert(rB >= rA - 1e-9, s"recall fell widening nprobe $npA->$npB: $rA -> $rB")
    }
    val graded = curve.toMap
    // graded config (q_ann_ivf_multiprobe probes top-2 of 10 clusters):
    // even on heavily-overlapping clusters, 2 probes must keep a
    // usable recall floor, and 5 probes must approach exact.
    // Measured curve on this fixture (seed 7, deterministic):
    //   nprobe 1 -> 0.763, 2 -> 0.873, 3 -> 0.943, 5 -> 0.977
    // Floors sit one notch below the measured values so a real recall
    // regression trips while k-means tie-break drift does not.
    assert(graded(2) >= 0.80, s"nprobe=2 recall@10 too low: ${graded(2)}")
    assert(graded(5) >= 0.95, s"nprobe=5 recall@10 too low: ${graded(5)}")
  }
}
