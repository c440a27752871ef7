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

  test("salt is a pure function of row content (retry-stable across layouts)") {
    // The same rows under different partition layouts and orders must get
    // the same salt multiset — position-based salts fail this (the
    // SPARK-23207 indeterminate-retry hazard ADVICE r2 flagged).
    val rows = (1 to 500).map(i => (1L, i))
    val a = rows.toDF("k", "lv").repartition(16)
    val b = scala.util.Random.shuffle(rows).toDF("k", "lv").repartition(3)
    def saltHisto(df: org.apache.spark.sql.DataFrame) =
      SkewJoin.saltedInner(df, Seq((1L, "r")).toDF("k", "rv"), "k", buckets = 8)
        .groupBy("k", "lv").count().as[(Long, Int, Long)].collect().sorted
    assert(saltHisto(a) === saltHisto(b))
  }

  test("spreadDuplicates fans exact duplicate rows across buckets, result unchanged") {
    // 1000 byte-identical rows: content hash alone puts them in ONE bucket;
    // spreadDuplicates must spread them while keeping the join exact.
    val left = (1 to 1000).map(_ => (1L, 42)).toDF("k", "lv")
    val right = Seq((1L, "r1"), (2L, "r2")).toDF("k", "rv")
    val got = SkewJoin.saltedInner(left, right, "k", buckets = 8, spreadDuplicates = true)
      .select("k", "lv", "rv").as[(Long, Int, String)].collect()
    assert(got.length === 1000)
    assert(got.forall(_ == (1L, 42, "r1")))
    // and the fan-out actually happened: re-derive the salt distribution
    val withSalt = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)) +
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("k"), xxhash64(struct(left.columns.map(col): _*)))
          .orderBy(xxhash64(struct(left.columns.map(col): _*)))), lit(8L)))
    assert(withSalt.select("_salt").distinct().count() === 8L)
  }
}
