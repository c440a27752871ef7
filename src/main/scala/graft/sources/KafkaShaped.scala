package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Executable contract for the Kafka source/sink mapping (SURVEY.md §2.1,
  * reference anchor: flink-connector-kafka .../FlinkKafkaConsumerBase.java,
  * FlinkKafkaProducerBase.java). The Kafka connector JAR itself is
  * unavailable in this zero-egress environment, so the mapping is pinned
  * with a FILE-BACKED fake that exposes the EXACT frame shape and
  * semantics `spark.readStream.format("kafka")` yields — everything
  * downstream of the source line is then real and portable:
  *
  * {{{
  * // production (spark-sql-kafka artifact on the classpath):
  * spark.readStream.format("kafka")
  *   .option("kafka.bootstrap.servers", servers)
  *   .option("subscribe", topic)
  *   .option("startingOffsets", "earliest")   // FlinkKafkaConsumer.setStartFromEarliest
  *   .load()                                   // ← KafkaShaped.readStream replaces THIS line only
  * }}}
  *
  * Semantics map (Flink 1.3 → Structured Streaming):
  *  - per-partition offset order is preserved; NO cross-partition order —
  *    both engines only guarantee order within a topic-partition;
  *  - exactly-once: Flink snapshots consumer offsets in checkpoints and
  *    rewinds on recovery; Spark tracks offsets in the streaming
  *    checkpoint (WAL) per micro-batch — a stop/restart on the same
  *    checkpoint resumes after the last committed batch, no replays into
  *    the sink (pinned by KafkaContractSpec);
  *  - group-offset commit (`FlinkKafkaConsumerBase.notifyCheckpointComplete`
  *    → commitAsync): in Spark the broker-side commit is observational
  *    only; the equivalent hook is [[withOffsetCommit]] — a foreachBatch
  *    that reports max offset per (topic, partition) after each batch;
  *  - `FlinkKafkaProducer` (at-least-once per-record write) maps to the
  *    kafka sink format, or foreachBatch + batch write for EOS sinks.
  */
object KafkaShaped {

  /** The exact schema `format("kafka")` exposes (Spark kafka-0-10-sql). */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Streaming read of a file-backed topic directory in the Kafka frame
    * shape. `maxFilesPerTrigger=1` replays one file per micro-batch —
    * the shape of a consumer draining a partition backlog. */
  def readStream(s: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 1): DataFrame =
    s.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Batch read of the same layout (startingOffsets=earliest, bounded). */
  def readBatch(s: SparkSession, dir: String): DataFrame =
    s.read.schema(schema).parquet(dir)

  /** Standard consumption projection: UTF-8 decode + JSON parse of the
    * value bytes — the DeserializationSchema step of the reference's
    * consumer, as Catalyst expressions. */
  def decodeJson(valueSchema: StructType): Column =
    from_json(col("value").cast("string"), valueSchema)

  /** Offset-commit mapping: after each micro-batch, report the max offset
    * per (topic, partition) delivered in that batch — the information
    * `notifyCheckpointComplete` commits to the consumer group. `commit`
    * runs on the driver once per batch (batchId is the micro-batch id;
    * Spark guarantees batchId-monotonic, per-partition-monotonic offsets
    * on one checkpoint). Returns the writer so callers chain
    * `.option("checkpointLocation", ...)` / sinks. */
  def withOffsetCommit(df: DataFrame)(
      commit: (Long, Map[(String, Int), Long]) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val offsets = batch.groupBy(col("topic"), col("partition"))
        .agg(max(col("offset")).as("max_offset"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
        .toMap
      commit(batchId, offsets)
    }

  /** Test/demo helper: write `rows` of (key, value, topic, partition,
    * offset, ts) into `dir` as one parquet file per call — one file ==
    * one broker fetch batch under `maxFilesPerTrigger=1`. */
  def appendTopicFile(s: SparkSession, dir: String,
                      rows: Seq[(Array[Byte], Array[Byte], String, Int, Long, java.sql.Timestamp)]): Unit = {
    import s.implicits._
    rows.toDF("key", "value", "topic", "partition", "offset", "timestamp")
      .withColumn("timestampType", lit(0)) // 0 == CreateTime
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
      .coalesce(1).write.mode("append").parquet(dir)
  }
}
