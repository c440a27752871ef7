package graft

import org.apache.spark.sql.SparkSession

/** Generic per-query stage profiler (round 20) — times registry queries
  * with job/stage accounting, the evidence tool behind the
  * OPTIMIZATION_r20.md "what dominates" claims. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.QProfile q1,q2[,...]"
  * Each query runs `rounds` times (default 3) after one warmup; stages
  * with > 0.3 core-s of executor run time print with run/cpu/gc split so
  * contention (run >> cpu) is visible. */
object QProfile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(Seq.empty)
    require(names.nonEmpty, "usage: QProfile q1,q2[,...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_QPROF_ROUNDS", "3").toInt
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = sys.env.get("SPARK_GRAFT_EXTRA_CONF").map(_.split(";"))
      .getOrElse(Array.empty).filter(_.contains("="))
      .foldLeft(b0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val verbose = new java.util.concurrent.atomic.AtomicBoolean(false)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = s.stageInfo
          val rt = si.taskMetrics.executorRunTime / 1e3
          if (verbose.get() && rt > 0.3)
            println(f"[qprof]   stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
              f"run=$rt%6.2f cpu=${si.taskMetrics.executorCpuTime / 1e9}%6.2f " +
              f"gc=${si.taskMetrics.jvmGCTime / 1e3}%5.2f  ${si.name.take(70)}")
        }
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
      })

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      graft.queries.Registry.prepares.get(name).foreach(p => p(spark, sfDir))
      // warmup
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      for (r <- 1 to rounds) {
        verbose.set(r == rounds) // stage detail on the last (warmest) round
        val j0 = jobs.get(); val n0 = taskNanos.get()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150)
        println(f"[qprof] $name%-28s r$r  $wall%6.2f s  " +
          f"(jobs=${jobs.get() - j0}%3d, core-s=${(taskNanos.get() - n0) / 1e9}%7.2f)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
