package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Dev probe (not a spec): prints every graded query whose optimized
  * logical plan contains a Window with an EMPTY partition spec — the
  * single-partition WindowExec family PlanAuditSpec polices. Used to
  * maintain the allowlist; run with `Test/runMain graft.GlobalWindowProbe`.
  */
object GlobalWindowProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    SparkEntry.all.foreach { q =>
      try {
        val plan = SparkEntry.queries(q.name)(spark, TestSpark.sf0001)
          .queryExecution.optimizedPlan
        val globals = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
        if (globals.nonEmpty)
          println(s"GLOBALWIN ${q.name}: ${globals.size}")
      } catch {
        case e: Throwable => println(s"GLOBALWIN ${q.name}: ERROR $e")
      }
    }
    spark.stop()
  }
}
