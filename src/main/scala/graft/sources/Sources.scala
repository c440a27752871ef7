package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source/sink facade (reference: flink-core/.../api/common/io/
  * {FileInputFormat,FileOutputFormat}.java; flink-java/.../io/
  * CsvInputFormat.java, TextInputFormat via ExecutionEnvironment
  * .readTextFile/readCsvFile; BinaryInputFormat): the reference's
  * InputFormat split model maps to Spark's DataSource scans — splits,
  * schema projection, and predicate pushdown are Catalyst-native.
  *
  * The surface below covers the file formats the runtime ships natively:
  * parquet, orc, csv, json, text, binaryFile. Avro and JDBC are REAL in
  * [[AvroJdbc]] (Hadoop-compat AvroKeyInputFormat path; embedded-Derby
  * JDBC with parameterized splits + pushdown). The Kafka connector JAR
  * alone remains env-blocked (zero egress).
  * The Kafka mapping itself is no longer doc-only: [[KafkaShaped]] pins
  * the exact `format("kafka")` frame shape, per-partition order,
  * offset-commit reporting, and checkpointed exactly-once resume with a
  * file-backed fake + KafkaContractSpec, so swapping in the real
  * connector changes one `.format(...)` line.
  */
object Sources {

  def parquet(s: SparkSession, path: String): DataFrame = s.read.parquet(path)

  def orc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  /** CSV with explicit schema — the CsvInputFormat equivalent (header
    * on/off, custom delimiter; parser per primitive type is built-in). */
  def csv(s: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    s.read.schema(schema).option("header", header).option("delimiter", delimiter).csv(path)

  /** Line-delimited JSON with explicit schema. */
  def json(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  /** readTextFile equivalent: one row per line, column `value`. */
  def text(s: SparkSession, path: String): DataFrame = s.read.text(path)

  /** BinaryInputFormat analogue: (path, modificationTime, length, content). */
  def binaryFiles(s: SparkSession, path: String): DataFrame =
    s.read.format("binaryFile").load(path)

  /** writeAsCsv / writeAsText / output(FileOutputFormat) equivalents. */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Partitioned (bucketed-by-column) file layout — the BucketingSink's
    * directory-per-bucket shape for batch output. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Hash-bucketed catalog table: rows co-partitioned (and sorted) by
    * `cols` into `n` buckets. Joins between two tables bucketed the same
    * way need NO shuffle — the scale path for repeated large-large joins
    * (e.g. dedup candidate↔signature lookups at corpus scale), replacing
    * the reference's REPARTITION_HASH strategy with a persisted layout. */
  def writeBucketed(df: DataFrame, table: String, n: Int, cols: Seq[String]): Unit = {
    val spark = df.sparkSession
    // CTAS refuses a leftover location even in overwrite mode (a dropped
    // table's directory survives crashes) — clear both catalog entry and dir
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    org.apache.commons.io.FileUtils.deleteQuietly(loc)
    df.write.mode("overwrite")
      .bucketBy(n, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .format("parquet").saveAsTable(table)
  }
}
