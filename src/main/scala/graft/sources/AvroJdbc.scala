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

  // ---- exactly-once streaming JDBC sink ------------------------------
  //
  // The reference's JDBCOutputFormat is at-least-once (flushed batches
  // replay after restart). This closes the gap with the standard Spark
  // recipe, made of two independent idempotence layers:
  //  (a) per-row MERGE upserts keyed on `keyCol` — replaying a batch
  //      re-merges to the IDENTICAL end state (covers the crash window
  //      between a partition's data commit and everything after);
  //  (b) a ledger row (runKey, table, batchId), inserted after the data —
  //      a fully-committed batch replayed after checkpoint loss within
  //      the same run is skipped wholesale.
  // Either layer alone gives effectively-once for update-mode aggregate
  // output; together a replay does no work at all in the common case.
  // Key and value columns are BIGINT (the aggregate-sink shape); other
  // types = widen the CASTs below per schema.

  private def withConn[T](url: String)(f: java.sql.Connection => T): T = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def ignoreExists(f: => Unit): Unit =
    try f catch {
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () // exists
    }

  /** Create the target table (quoted, case-preserved) + the shared ledger
    * if absent. */
  def ensureUpsertTables(url: String, table: String, keyCol: String,
                         valCols: Seq[String]): Unit = withConn(url) { c =>
    val st = c.createStatement()
    try {
      ignoreExists(st.execute(
        s"""CREATE TABLE "$table" ("$keyCol" BIGINT PRIMARY KEY, ${
          valCols.map(v => s""""$v" BIGINT""").mkString(", ")})"""))
      ignoreExists(st.execute(
        """CREATE TABLE "graft_sink_ledger" (
           "run_key" VARCHAR(512) NOT NULL, "tbl" VARCHAR(128) NOT NULL,
           "batch" BIGINT NOT NULL,
           PRIMARY KEY ("run_key", "tbl", "batch"))"""))
    } finally st.close()
  }

  /** Upsert ONE micro-batch: ledger check → per-partition MERGE → ledger
    * insert. Returns false when the ledger says this (runKey, batch) is
    * already fully applied. Executor-side connections; no driver collect.
    *
    * `maxWriters` caps concurrent sink connections. Default 1: embedded
    * Derby's storage layer NPEs under concurrent MERGE writers (observed at
    * sf0.1) — and an embedded single-node engine gains nothing from
    * parallel writers anyway. Against a server RDBMS raise it to the
    * connection budget; each partition keeps its own transaction. */
  def upsertBatch(batch: DataFrame, batchId: Long, url: String, table: String,
                  keyCol: String, valCols: Seq[String], runKey: String,
                  maxWriters: Int = 1): Boolean = {
    val applied = withConn(url) { c =>
      val ps = c.prepareStatement(
        """SELECT 1 FROM "graft_sink_ledger" WHERE "run_key" = ? AND "tbl" = ? AND "batch" = ?""")
      try {
        ps.setString(1, runKey); ps.setString(2, table); ps.setLong(3, batchId)
        val rs = ps.executeQuery(); try rs.next() finally rs.close()
      } finally ps.close()
    }
    if (applied) return false

    // Derby MERGE's source must be a table — the one-row SYSDUMMY1 with the
    // key bound twice (match probe + insert) is the standard per-row idiom
    val mergeSql =
      s"""MERGE INTO "$table" t USING SYSIBM.SYSDUMMY1
          ON t."$keyCol" = CAST(? AS BIGINT)
          WHEN MATCHED THEN UPDATE SET ${
            valCols.map(v => s"""t."$v" = CAST(? AS BIGINT)""").mkString(", ")}
          WHEN NOT MATCHED THEN INSERT ("$keyCol", ${
            valCols.map(v => s""""$v"""").mkString(", ")})
          VALUES (CAST(? AS BIGINT), ${valCols.map(_ => "CAST(? AS BIGINT)").mkString(", ")})"""
    val nVals = valCols.length
    batch.select(keyCol, valCols: _*).coalesce(maxWriters).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val c = java.sql.DriverManager.getConnection(url)
          try {
            c.setAutoCommit(false)
            val ps = c.prepareStatement(mergeSql)
            try {
              rows.foreach { r =>
                val k = r.getLong(0)
                ps.setLong(1, k)                                   // ON probe
                (0 until nVals).foreach(i => ps.setLong(2 + i, r.getLong(1 + i)))
                ps.setLong(2 + nVals, k)                           // INSERT key
                (0 until nVals).foreach(i => ps.setLong(3 + nVals + i, r.getLong(1 + i)))
                ps.executeUpdate()
              }
            } finally ps.close()
            c.commit()
          } finally c.close()
        }
    }

    withConn(url) { c =>
      val ps = c.prepareStatement(
        """INSERT INTO "graft_sink_ledger" VALUES (?, ?, ?)""")
      try {
        ps.setString(1, runKey); ps.setString(2, table); ps.setLong(3, batchId)
        try ps.executeUpdate()
        catch { // two replayers raced to complete the same batch: fine, both merged
          case e: java.sql.SQLException if e.getSQLState == "23505" => ()
        }
      } finally ps.close()
    }
    true
  }

  /** Start an update-mode stream into the exactly-once sink. `checkpoint`
    * doubles as the ledger run key: restarts of the SAME run (same
    * checkpoint) dedupe on the ledger; a fresh checkpoint replays through
    * the idempotent merge. */
  def startUpsertSink(stream: DataFrame, url: String, table: String,
                      keyCol: String, valCols: Seq[String],
                      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    ensureUpsertTables(url, table, keyCol, valCols)
    stream.writeStream.outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        upsertBatch(b, id, url, table, keyCol, valCols, runKey = checkpoint); ()
      }
      .start()
  }
}
