package graft

import org.apache.spark.sql.functions._

/** Approximate/sketch surface (the "novel sketch" capability class): these
  * are Spark-native — Count-Min Sketch via df.stat, HyperLogLog++ via
  * approx_count_distinct, quantile sketch via approx_percentile — so the
  * library's job is to pin that they exist, compose, and land within their
  * error bounds against exact answers the rest of the suite trusts. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tokens = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")
    .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    .cache()

  test("Count-Min Sketch finds token heavy hitters within its epsilon bound") {
    val exact = tokens.groupBy("tok").count()
      .orderBy(col("count").desc, col("tok")).limit(10)
      .as[(String, Long)].collect()
    val total = tokens.count()
    val cms = tokens.stat.countMinSketch("tok", eps = 0.001, confidence = 0.99, seed = 42)
    exact.foreach { case (tok, n) =>
      val est = cms.estimateCount(tok)
      assert(est >= n, s"CMS never underestimates, got $est < $n for '$tok'")
      assert(est <= n + (0.001 * total).toLong + 1,
        s"CMS estimate $est for '$tok' beyond eps bound (exact $n, total $total)")
    }
  }

  test("HyperLogLog distinct-token estimate lands within 5% of exact") {
    val exact = tokens.distinct().count().toDouble
    val est = tokens.agg(approx_count_distinct(col("tok"), rsd = 0.02))
      .as[Long].collect().head.toDouble
    assert(math.abs(est - exact) / exact < 0.05, s"HLL $est vs exact $exact")
  }

  test("approx_percentile brackets the exact median of token lengths") {
    val lens = tokens.select(length(col("tok")).as("l"))
    val exact = lens.agg(expr("percentile(l, 0.5)")).as[Double].collect().head
    val approx = lens.agg(expr("approx_percentile(l, 0.5, 1000)")).as[Int].collect().head
    assert(math.abs(approx - exact) <= 1.0, s"approx $approx vs exact $exact")
  }
}
