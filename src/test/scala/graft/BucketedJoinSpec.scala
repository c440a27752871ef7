package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join with no shuffle exchange") {
    Seq("graft_bkt_a", "graft_bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    val a = (1 to 10000).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (1 to 10000).map(i => (i.toLong, i * 2L)).toDF("k", "bv")
    Sources.writeBucketed(a, "graft_bkt_a", 8, Seq("k"))
    Sources.writeBucketed(b, "graft_bkt_b", 8, Seq("k"))
    // force the large-large join path (broadcast would win on toy sizes
    // and bypass bucketing — at real scale neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, plan:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan should use buckets:\n$plan")
      assert(joined.count() === 10000L)
      // correctness of the co-partitioned join
      val r = joined.filter($"k" === 7L).select("av", "bv").as[(String, Long)].collect()
      assert(r.toSeq === Seq(("a7", 14L)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
