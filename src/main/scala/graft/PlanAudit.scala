package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape diagnostic: runs each (or the named) registry query on a small
  * SF and prints exchange / cartesian / broadcast-nested-loop counts — the
  * quick smell test for plans that won't survive a scale-up. Usage:
  *   sbt "runMain graft.PlanAudit <sfDir> [q1,q2,...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).headOption.map(_.split(",").toSet)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          df.collect()
          val p = df.queryExecution.executedPlan.toString
          // shuffle exchanges only — "Exchange " alone would also count
          // BroadcastExchange and misreport broadcast-only plans
          val ex = "(?<!Broadcast)Exchange ".r.findAllIn(p).length
          val cart = "CartesianProduct".r.findAllIn(p).length
          val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).length
          val sorts = "Sort ".r.findAllIn(p).length
          // duplicated subtrees Catalyst dedupes at runtime — high counts
          // of raw exchanges with matching reuse are fine; without, the
          // subtree genuinely runs twice
          val reused = "ReusedExchange".r.findAllIn(p).length
          println(f"$name%-30s exchanges=$ex%-3d sorts=$sorts%-3d cartesian=$cart bnlj=$bnl reused=$reused")
        } catch { case e: Throwable => println(f"$name%-30s ERROR ${e.getMessage}") }
      }
    spark.stop()
  }
}
