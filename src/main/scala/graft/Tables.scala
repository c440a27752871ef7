package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Mirrors the reference's source surface for this project's data: the
  * reference reads splits via FileInputFormat subclasses (reference:
  * flink-core .../api/common/io/FileInputFormat.java); here the parquet
  * DataSource V2 scan gives vectorized reads + predicate/column pushdown
  * for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") events(spark, dir) else spark.read.parquet(path(dir, name))
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no type for:
    * read the raw int64 nanos (legacy flag) and floor-divide to microsecond
    * TimestampType — the same ns→µs truncation DuckDB applies on read, so
    * oracle comparisons agree exactly. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, "events"))
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }

  /** Register every fixture table as a temp view (for spark.sql queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
