package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for qfa_exact_substr_index (round 20): times
  * each delivery of the three-slice gate separately (ingest now returns
  * lazily, so a delivery's reading covers grams+counts+probe+skeleton+
  * append; the final union count covers the three excision rebuilds), and
  * attributes wall time to Spark jobs via a listener. Usage:
  * SPARK_GRAFT_SF_DIR=... sbt "runMain graft.QfaProfile"
  */
object QfaProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf overrides for A/B probes: SPARK_GRAFT_EXTRA_CONF=k=v;k=v
    val spark = sys.env.get("SPARK_GRAFT_EXTRA_CONF").map(_.split(";"))
      .getOrElse(Array.empty).filter(_.contains("="))
      .foldLeft(b0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    // job-level accounting: jobs started/ended + task time per label window
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet()
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          jobStarts.put(j.jobId, (System.nanoTime(), desc))
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobStarts.remove(j.jobId)
          if (s != null)
            println(f"[qfaprof]     job ${j.jobId}%3d ${(System.nanoTime() - s._1) / 1e9}%6.2f s  ${s._2.take(90)}")
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = s.stageInfo
          val rt = si.taskMetrics.executorRunTime / 1e3
          if (rt > 0.3) {
            println(f"[qfaprof]       stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
              f"run=$rt%6.2f core-s  ${si.name.take(80)}")
            if (rt > 3.0) {
              val det = si.details.linesIterator
                .filter(l => l.contains("graft") || l.contains("Dedup") ||
                  l.contains("GramIndex")).take(6).mkString(" | ")
              println(s"[qfaprof]         details: ${det.take(300)}")
              val gc = si.taskMetrics.jvmGCTime / 1e3
              val des = si.taskMetrics.executorDeserializeTime / 1e3
              println(f"[qfaprof]         gc=$gc%6.2f deser=$des%6.2f " +
                f"cpu=${si.taskMetrics.executorCpuTime / 1e9}%6.2f")
            }
          }
        }
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
      })

    def timed[T](label: String)(body: => T): T = {
      val j0 = jobCount.get(); val n0 = taskNanos.get()
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(120) // listener bus drain
      println(f"[qfaprof] $label%-44s $wall%7.2f s  " +
        f"(jobs=${jobCount.get() - j0}%3d, task-core-s=${(taskNanos.get() - n0) / 1e9}%7.2f)")
      r
    }

    val docsAll = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[qfaprof] docs=${docsAll.count()} " +
      s"chars=${docsAll.agg(sum(length(col("text")))).head().getLong(0)}")

    // UNPRUNED hash-pass cost (bit_xor forces h and h2): 1 vs 32 partitions
    for (round <- 1 to 2; fan <- Seq(false, true)) {
      val d0 = docsAll.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("_d"), col("text").as("_t"),
          length(col("text")).cast("long").as("_len"))
      val d = if (fan) graft.operators.Partitioning.fanOutForCompute(d0, col("_d")) else d0
      timed(s"gram hash pass UNPRUNED fan=$fan r$round") {
        graft.operators.Dedup.charGramFingerprints(d, 40)
          .agg(bit_xor(col("h")), bit_xor(col("h2")), count(lit(1))).head()
      }
      timed(s"gram hash pass + ckpt    fan=$fan r$round") {
        graft.operators.Dedup.charGramFingerprints(d, 40).localCheckpoint()
      }
    }

    // fixed-cost floor: minLen larger than any doc -> zero grams, so the
    // reading is lease+attach+probe-plumbing+append+DDL with no compute
    for (round <- 1 to 2) {
      val refF = graft.operators.GramIndex.Ref(s"qfafloor$round", buckets = 8)
      graft.operators.GramIndex.drop(spark, refF)
      (0 until 3).foreach { slice =>
        timed(s"FLOOR ingest slice $slice (zero grams) r$round") {
          graft.operators.GramIndex.ingest(
            docsAll.filter(col("doc_id") % 3 === slice), "doc_id", "text",
            minLen = 100000, refF)
        }
      }
      graft.operators.GramIndex.drop(spark, refF)
    }

    for (round <- 1 to 2) {
      println(s"[qfaprof] ===== round $round =====")
      val tag = s"qfaprof$round"
      val ref = graft.operators.GramIndex.Ref(tag, buckets = 8)
      timed("drop (idempotent re-run preamble)") {
        graft.operators.GramIndex.drop(spark, ref)
      }
      val outs = timed("ingestSlices (all three deliveries)") {
        graft.operators.GramIndex.ingestSlices(
          (0 until 3).map(s => docsAll.filter(col("doc_id") % 3 === s)),
          "doc_id", "text", minLen = 40, ref)
      }
      timed("union count (3 excision rebuilds)") {
        outs.reduce(_ unionByName _).count()
      }
      timed("union noop (rebuilds incl. text)") {
        outs.reduce(_ unionByName _)
          .write.format("noop").mode("overwrite").save()
      }
      graft.operators.GramIndex.drop(spark, ref)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
