package graft

import graft.queries.Registry
import org.apache.spark.sql.SparkSession

/** Profiling main for the driver-loop iteration fixed costs. A/Bs the
  * small-loop execution profile (Iterations.withLoopProfile) via its
  * `graft.loop.bigRows` system property — external conf knobs would be
  * clobbered by the profile inside the loop, so on/off via the property
  * is the only honest comparison — and breaks the SSSP gate into build
  * cost vs per-round cost.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.IterBench"
  */
object IterBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JVM + codegen + scan
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    Registry.queries("qa2_graph_pagerank")(spark, sfDir).count()

    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[iterbench] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }

    def withProfile(on: Boolean)(body: => Long): Long = {
      val old = sys.props.get("graft.loop.bigRows")
      sys.props("graft.loop.bigRows") = if (on) "1000000" else "0"
      try body finally old match {
        case Some(v) => sys.props("graft.loop.bigRows") = v
        case None => sys.props -= "graft.loop.bigRows"
      }
    }

    val run = () => Registry.queries("qa2_graph_pagerank")(spark, sfDir).count()

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      timed("pagerank, loop profile ON")(withProfile(on = true)(run()))
      timed("pagerank, loop profile OFF")(withProfile(on = false)(run()))
    }

    // qbm breakdown: wedge build vs per-round loop cost
    import graft.operators.GraphOps
    import org.apache.spark.sql.functions._
    def sspRun(iters: Int): Long = {
      val ued = GraphOps.undirected(
        Tables(spark, sfDir, "orders").join(Tables(spark, sfDir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"), (lit(100000) + col("l_suppkey")).as("dst"))
          .distinct()).cache()
      val w = ued.withColumn("wt", expr("(a + b) % 7 + 1"))
      val out = GraphOps.sssp(w, ued.agg(min(col("a")).as("s")), maxIter = iters).count()
      ued.unpersist()
      out
    }
    for (round <- 1 to 2) {
      println(s"--- sssp breakdown round $round ---")
      timed("sssp maxIter=0 (build only)")(sspRun(0))
      timed("sssp maxIter=1")(sspRun(1))
      timed("sssp maxIter=5")(sspRun(5))
    }
    spark.stop()
  }
}
