package graft.tools

import graft.queries.Dedup
import org.apache.spark.sql.functions.{col, max}

/** Dev tool (not part of the library surface): measure the
  * incremental near-dup contract of `q_dedup_minhash_incremental` —
  * per-batch ingest cost must scale with the BATCH, not with the
  * history corpus (VERDICT r10 item 2's "measured ∝ batch" clause).
  *
  * `IncrementalProbe <sfDir> [<sfDir> ...] [batchDocs=100]`
  *
  * Per directory: history = all docs below (maxId − batchDocs + 1),
  * batch = the top `batchDocs` ids — so the BATCH SIZE IS FIXED while
  * the history grows with the corpus (sf0.01: 400-doc history;
  * sf1 10×: 4 900). Untimed warm-up ingests the history into the
  * persisted BandHistory table (the append-only, hash-bucketed table
  * a production pipeline owns). The timed region is one full probe:
  * band the batch slice FRESH from text (tokenize/md5 over batch rows
  * only), anti-join the saturated-bucket set, bucket-pruned-read +
  * join history bands, and Jaccard-verify candidates (tokenizing only
  * candidate docs). Three iterations, min reported. Prints one JSON
  * line per directory.
  */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IncrementalProbe <sfDir>... [batchDocs=N]")
    val (dirs, batchDocs) = args.partition(!_.startsWith("batchDocs=")) match {
      case (ds, opts) =>
        (ds.toSeq, opts.headOption.map(_.stripPrefix("batchDocs=").toInt)
          .getOrElse(100))
    }
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- dirs) {
      val maxId = graft.Tables.documents(spark, d)
        .agg(max(col("doc_id"))).head().getLong(0)
      val split = maxId - batchDocs + 1
      val histDocs = graft.Tables.documents(spark, d)
        .filter(col("doc_id") < split).count()
      // warm the persisted history artifact, untimed
      Dedup.warmIncrementalHistory(spark, d, split)
      val secs = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val n = Dedup.minhashIncrementalPairs(spark, d, split).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val pairs = secs.head._1
      println(f"""{"sf_dir":"$d","history_docs":$histDocs,""" +
        f""""batch_docs":$batchDocs,"pairs":$pairs,""" +
        f""""sec":${secs.map(_._2).min}%.3f}""")
    }
    spark.stop()
  }
}
