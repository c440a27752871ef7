package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of registry queries to files — the
  * optimization-round evidence trail (plans/r19/<query>_{before,after}.txt).
  * Usage:
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]"
  * Writes <outDir>/<query>_<suffix>.txt for each selected query. The plan is
  * captured AFTER one execution so AQE's final plan (the shape that actually
  * ran) is recorded alongside the initial formatted plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only = args.lift(3).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          graft.queries.Registry.prepares.get(name).foreach { p =>
            try p(spark, sfDir) catch { case _: Throwable => () }
          }
          val df = fn(spark, sfDir)
          val initial = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          df.write.format("noop").mode("overwrite").save()
          val executed = df.queryExecution.executedPlan.toString
          val txt = s"== explain(formatted), initial plan ==\n$initial\n" +
            s"== executed plan (post-AQE) ==\n$executed\n"
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
            txt.getBytes("UTF-8"))
          spark.catalog.clearCache()
          println(s"[plandump] wrote $name")
        } catch { case e: Throwable =>
          println(s"[plandump] $name ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
