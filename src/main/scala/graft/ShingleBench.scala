package graft

import graft.functions.Hashes
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: the SCALE.md "shingle-hash kernel" profile. Times the
  * dedup operators' shared text pass — documents → sorted distinct shingle
  * hashes — in its UDF form vs the native ShingleHashesExpr, same JVM,
  * alternating reps, cache dropped between runs. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ShingleBench"
  */
object ShingleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents").select("text")
    docs.count() // warm the scan

    def time(tag: String, arm: => Long): Unit = {
      val t0 = System.nanoTime()
      val chk = arm
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s (checksum $chk)")
    }
    // sum(size) forces every array; identical checksums pin equivalence
    def udfArm(): Long = docs
      .select(sum(size(Hashes.shingleHashesUdf(2)(col("text"))))).head().getLong(0)
    def natArm(): Long = docs
      .select(sum(size(Hashes.shingleHashCol(col("text"), 2)))).head().getLong(0)

    (1 to 3).foreach { r => time(s"udf   rep$r", udfArm()); time(s"native rep$r", natArm()) }
    spark.stop()
  }
}
