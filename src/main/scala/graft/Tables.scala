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

  /** `events.ts` has shipped in three physical layouts across fixture
    * generations; all must land as session-zoned TimestampType with the same
    * epoch-micros so watermarks (`withWatermark` requires TimestampType) and
    * the DuckDB oracle agree exactly:
    *  - TIMESTAMP(NANOS): Spark has no nanos type — read raw int64 via the
    *    legacy flag, floor-divide to micros (DuckDB applies the same ns→µs
    *    truncation on read);
    *  - timestamp[us] isAdjustedToUTC=false: Spark reads TIMESTAMP_NTZ —
    *    cast to TimestampType (UTC session tz makes the cast
    *    instant-preserving);
    *  - timestamp[us] UTC: already TimestampType, pass through. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(path(dir, "events")))
  }

  private[graft] def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Register every fixture table as a temp view (for spark.sql queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
