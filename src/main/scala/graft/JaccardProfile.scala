package graft

import graft.functions.Hashes
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: stage-by-stage timing of the q84 exact-Jaccard pipeline
  * at sf0.1 — which part of the 36M-pair-event regime costs the time. */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")
    docs.count()

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = docs.select(col("doc_id").as("doc"),
      Hashes.shingleHashCol(col("text"), 2).as("shs"))
    val idx = base.select(col("doc"), size(col("shs")).cast("long").as("nsh"),
      explode(col("shs")).as("sh")).cache()
    time("1 idx materialize")(println("  idx rows = " + idx.count()))

    val joined = idx.as("a").join(idx.as("b"),
      col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
    time("2 join count only")(println("  pair events = " + joined.count()))

    val aggFirst = joined
      .groupBy(col("a.doc").as("id1"), col("b.doc").as("id2"))
      .agg(count(lit(1)).as("common"),
        first(col("a.nsh")).as("n1"), first(col("b.nsh")).as("n2"))
    time("3a agg first()")(println("  pairs = " + aggFirst.count()))

    val aggMin = joined
      .groupBy(col("a.doc").as("id1"), col("b.doc").as("id2"))
      .agg(count(lit(1)).as("common"),
        min(col("a.nsh")).as("n1"), min(col("b.nsh")).as("n2"))
    time("3b agg min()")(println("  pairs = " + aggMin.count()))

    val aggKeys = joined
      .groupBy(col("a.doc").as("id1"), col("b.doc").as("id2"),
        col("a.nsh").as("n1"), col("b.nsh").as("n2"))
      .agg(count(lit(1)).as("common"))
    time("3c agg 4-key")(println("  pairs = " + aggKeys.count()))

    val sizes = base.select(col("doc"), size(col("shs")).cast("long").as("nsh"))
    val aggJoin = joined
      .groupBy(col("a.doc").as("id1"), col("b.doc").as("id2"))
      .agg(count(lit(1)).as("common"))
      .join(broadcast(sizes.toDF("id1", "n1")), "id1")
      .join(broadcast(sizes.toDF("id2", "n2")), "id2")
    time("3d agg count + bcast size joins")(println("  pairs = " + aggJoin.count()))

    def full(c: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val out = c.withColumn("jaccard", col("common").cast("double") /
          (col("n1") + col("n2") - col("common")).cast("double"))
        .filter(col("jaccard") >= 0.05)
      time(s"4 full $tag")(println("  out = " + out.count()))
    }
    full(aggMin, "min")
    full(aggJoin, "bcast")
    spark.stop()
  }
}
