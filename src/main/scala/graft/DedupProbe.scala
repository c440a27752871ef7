package graft

import graft.functions.Hashes
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main for the q85_minhash_dedup pipeline: breaks the query
  * into its stages and reports row counts + wall time per stage, so a
  * bench regression can be attributed to a specific stage (hashing,
  * banding, candidate join, pre-filter, exact verify) or to fixture
  * drift (candidate-pair pressure is a CORPUS property: the more the
  * fixture's docs share shingles, the more same-bucket pairs banding
  * emits regardless of engine quality).
  *
  * IterBench-protocol numbers (warm, standalone) — never quote against
  * BASELINE.md driver-protocol figures.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.DedupProbe"
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect() // JVM/codegen warmup

    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[dedupprobe] $label%-38s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    val docs = Tables(spark, sfDir, "documents")
    val (n, k, bands) = (2, 128, 64)

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      spark.catalog.clearCache()
      val sh = docs.select(col("doc_id").as("doc"),
        Hashes.shingleHashCol(col("text"), n).as("shs")).cache()
      timed("1 shingle-hash sets")(sh.count())
      val sigs = sh.select(col("doc"),
        Hashes.minhashFromHashes(col("shs"), k).as("sig")).cache()
      timed("2 minhash signatures")(sigs.count())
      timed("3 LSH candidate pairs (distinct)")(
        Dedup.lshCandidates(sigs, bands, k / bands).count())
      timed("4 full q85 (cand+prefilter+verify)")(
        Dedup.minhashDupPairs(docs, "doc_id", "text", n, k, bands, 0.5).count())
      spark.catalog.clearCache()
      timed("5 full q85 cold caches")(
        Dedup.minhashDupPairs(docs, "doc_id", "text", n, k, bands, 0.5).count())
    }
    spark.stop()
  }
}
