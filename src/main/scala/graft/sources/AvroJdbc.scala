package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro scan/sink via the Hadoop-compatibility path and JDBC scan/sink —
  * the two §2.1 connector rows that were doc-only until round 8
  * (reference anchors: flink-avro .../AvroInputFormat.java — an Avro
  * container-file reader on the FileInputFormat split model; flink-jdbc
  * .../JDBCInputFormat.java — parallel JDBC scans via parameterized
  * query splits).
  *
  * The environment ships avro/avro-mapred and the embedded Derby engine
  * (no spark-avro DataSource, no external DB), so:
  *  - Avro runs through `newAPIHadoopFile` + `AvroKeyInputFormat` — which
  *    is ALSO the executable evidence for the "Hadoop-compat input
  *    formats" row (the reference's HadoopInputFormat wrapper maps to
  *    exactly this call); container-file splitting (one Spark partition
  *    per HDFS-style split) comes from the Hadoop layer, the same split
  *    model FileInputFormat gives the reference. With the spark-avro
  *    artifact available this entire object collapses to
  *    `spark.read.format("avro")` — same frame, one line.
  *  - JDBC uses Spark's built-in jdbc source against embedded Derby; the
  *    partitioned overload maps JDBCInputFormat's
  *    NumericBetweenParametersProvider 1:1 (predicate + column pruning
  *    push into the generated SQL per partition).
  */
object AvroJdbc {

  /** Spark StructType → Avro record schema (nullable unions). Primitive
    * coverage matches what the fixtures and the reference's
    * AvroTypeInfo→Row bridge carry: string/long/int/double/float/
    * boolean/bytes. */
  def avroSchemaJson(schema: StructType, recordName: String = "row"): String = {
    def prim(dt: DataType): String = dt match {
      case StringType => "\"string\""
      case LongType => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType => "\"double\""
      case FloatType => "\"float\""
      case BooleanType => "\"boolean\""
      case BinaryType => "\"bytes\""
      case other => throw new IllegalArgumentException(
        s"avroSchemaJson: unsupported type $other (extend the mapping)")
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null", ${prim(f.dataType)}]""" else prim(f.dataType)
      s"""{"name": "${f.name}", "type": $t}"""
    }.mkString(",")
    s"""{"type": "record", "name": "$recordName", "fields": [$fields]}"""
  }

  /** AvroInputFormat equivalent: read Avro container files into a
    * DataFrame with the given Spark schema (fields matched by name
    * against the file's writer schema). */
  def avro(s: SparkSession, path: String, schema: StructType): DataFrame = {
    val fields = schema.fields
    val rows = s.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable])
      .map { case (k, _) =>
        // convert IMMEDIATELY: the input format reuses record instances
        val rec = k.datum()
        Row.fromSeq(fields.toIndexedSeq.map(f => fromAvro(rec.get(f.name), f.dataType)))
      }
    s.createDataFrame(rows, schema)
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u, StringType) => u.toString // org.apache.avro.util.Utf8 → String
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (other, _) => other
  }

  /** writeAsAvro equivalent: DataFrame → Avro container files (one per
    * partition, Hadoop output committer semantics). */
  def writeAvro(df: DataFrame, path: String, recordName: String = "row"): Unit = {
    val schemaJson = avroSchemaJson(df.schema, recordName)
    val fieldNames = df.schema.fieldNames
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    df.rdd.mapPartitions { it =>
      // Avro Schema is not serializable: parse per partition
      val schema = new Schema.Parser().parse(schemaJson)
      it.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fieldNames.length) {
          rec.put(fieldNames(i), row.get(i) match {
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case v => v
          })
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** JDBCInputFormat equivalent, single split. Filters/projections on the
    * returned frame push into the remote SQL (Catalyst JDBC pushdown). */
  def jdbc(s: SparkSession, url: String, table: String,
           props: java.util.Properties = new java.util.Properties()): DataFrame =
    s.read.jdbc(url, table, props)

  /** JDBCInputFormat with NumericBetweenParametersProvider: `numParts`
    * parallel scans over `[lower, upper]` strides of `partCol` — each
    * Spark partition issues one bounded query, the reference's
    * parameterized-split model exactly. */
  def jdbcPartitioned(s: SparkSession, url: String, table: String,
                      partCol: String, lower: Long, upper: Long, numParts: Int,
                      props: java.util.Properties = new java.util.Properties()): DataFrame =
    s.read.jdbc(url, table, partCol, lower, upper, numParts, props)

  /** JDBCOutputFormat equivalent (batched inserts per partition). */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode("overwrite").jdbc(url, table, props)
}
