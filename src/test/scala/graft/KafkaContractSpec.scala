package graft

import graft.sources.KafkaShaped
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the Kafka source/sink semantics mapping (SURVEY.md §2.1) with the
  * file-backed fake: frame shape, per-partition order, offset-commit
  * reporting, and exactly-once resume from a checkpoint — so the §2.1
  * connector rows rest on executable evidence, not scaladoc alone. */
class KafkaContractSpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_kafka_$tag").toFile
    d.deleteOnExit(); d.getPath
  }

  private def record(p: Int, off: Long): (Array[Byte], Array[Byte], String, Int, Long, java.sql.Timestamp) =
    (s"k$off".getBytes("UTF-8"),
      s"""{"n":${off * 10}}""".getBytes("UTF-8"), "t1", p, off, ts(1700000000000L + off))

  test("source frame has the exact format(\"kafka\") schema") {
    val dir = freshDir("schema")
    KafkaShaped.appendTopicFile(spark, dir, Seq(record(0, 0L)))
    val df = KafkaShaped.readBatch(spark, dir)
    assert(df.schema == KafkaShaped.schema)
    val stream = KafkaShaped.readStream(spark, dir)
    assert(stream.isStreaming && stream.schema == KafkaShaped.schema)
  }

  test("value decode path: cast + from_json yields typed rows") {
    val dir = freshDir("decode")
    KafkaShaped.appendTopicFile(spark, dir, Seq(record(0, 0L), record(0, 1L)))
    val out = KafkaShaped.readBatch(spark, dir)
      .select(KafkaShaped.decodeJson(StructType(Seq(StructField("n", LongType)))).as("v"))
      .select(col("v.n")).orderBy("n").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L, 10L))
  }

  test("offset commit reports per-partition max, batchId-monotonic") {
    val dir = freshDir("commit")
    KafkaShaped.appendTopicFile(spark, dir,
      Seq(record(0, 0L), record(0, 1L), record(1, 0L)))
    KafkaShaped.appendTopicFile(spark, dir,
      Seq(record(0, 2L), record(1, 1L)))
    val commits = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[(String, Int), Long])]
    val q = KafkaShaped.withOffsetCommit(
        KafkaShaped.readStream(spark, dir, maxFilesPerTrigger = 1))(
        (id, offs) => commits.synchronized { commits += ((id, offs)); () })
      .start()
    try q.processAllAvailable() finally q.stop()
    val snap = commits.synchronized(commits.toList).sortBy(_._1)
    assert(snap.size == 2, s"expected 2 micro-batches, got $snap")
    // batchIds strictly increase; within a partition the committed max
    // offset never goes backwards across batches (Kafka group-commit law)
    assert(snap.map(_._1) == snap.map(_._1).sorted)
    val perPart = snap.flatMap { case (id, m) => m.map { case (tp, o) => (tp, id, o) } }
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    perPart.foreach { case (tp, offs) =>
      assert(offs == offs.sorted, s"non-monotonic commit for $tp: $offs")
    }
    // union of batches covers every offset exactly once
    val total = snap.map(_._2.valuesIterator.sum).sum
    assert(perPart.keySet == Set(("t1", 0), ("t1", 1)) && total == (1L + 0L) + (2L + 1L))
  }

  test("exactly-once resume: restart on same checkpoint replays nothing") {
    val dir = freshDir("eos")
    val ckpt = freshDir("eos_ckpt")
    val outDir = freshDir("eos_out")
    KafkaShaped.appendTopicFile(spark, dir, Seq(record(0, 0L), record(0, 1L)))
    def runOnce(): Unit = {
      val q = KafkaShaped.readStream(spark, dir, maxFilesPerTrigger = 1)
        .select(col("partition"), col("offset"))
        .writeStream.option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir).start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    // stop → new data lands → restart on the SAME checkpoint: the sink
    // must receive only the new file, never a replay of batch 0 (Spark's
    // WAL-tracked offsets == Flink's checkpointed consumer offsets)
    KafkaShaped.appendTopicFile(spark, dir, Seq(record(0, 2L)))
    runOnce()
    val rows = spark.read.parquet(outDir).select("partition", "offset")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    assert(rows == Seq((0, 0L), (0, 1L), (0, 2L)), s"duplicate/missing rows: $rows")
  }
}
