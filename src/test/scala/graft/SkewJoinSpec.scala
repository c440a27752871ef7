package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedInner equals plain inner join on skewed data") {
    // 90% of left rows share one hot key
    val left = ((1 to 900).map(i => (1L, i)) ++ (901 to 1000).map(i => ((i % 7 + 2).toLong, i)))
      .toDF("k", "lv")
    val right = (1 to 9).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val expected = left.join(right, Seq("k"), "inner")
      .select("k", "lv", "rv").as[(Long, Int, String)].collect().sorted
    val got = SkewJoin.saltedInner(left, right, "k", buckets = 8)
      .select("k", "lv", "rv").as[(Long, Int, String)].collect().sorted
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("salting spreads a hot key across buckets") {
    val left = (1 to 1000).map(i => (1L, i)).toDF("k", "lv")
    val salts = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(8)))
      .select("_salt").distinct().count()
    assert(salts === 8L)
  }
}
