package graft

import graft.sources.AvroJdbc
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Executable evidence for the §2.1 Avro and JDBC connector rows: real
  * Avro container files through the Hadoop-compat input-format path, and
  * real JDBC scans (single + parameterized-partition) against embedded
  * Derby — including the pushdown the reference's formats advertise. */
class AvroJdbcSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_aj_$tag").toFile
    d.deleteOnExit(); d.getPath
  }

  test("avro roundtrip: all supported primitives + nulls survive bit-exactly") {
    val out = s"${tmp("avro")}/data"
    val df = Seq(
      (1L, "alpha", 1.5, true, Array[Byte](1, 2, 3)),
      (2L, "beta", -0.25, false, Array[Byte]()),
      (3L, null.asInstanceOf[String], 0.0, true, Array[Byte](9)))
      .toDF("id", "name", "score", "flag", "payload")
    AvroJdbc.writeAvro(df, out)
    val back = AvroJdbc.avro(spark, s"$out/part-*", df.schema)
    assert(back.schema == df.schema)
    val a = df.orderBy("id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case v => v })
    val b = back.orderBy("id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case v => v })
    assert(a.toSeq == b.toSeq)
  }

  test("avro read distributes: one partition per container file") {
    val out = s"${tmp("avro_parts")}/data"
    AvroJdbc.writeAvro(
      spark.range(100).select(col("id"), concat(lit("n"), col("id")).as("name"))
        .repartition(3), out)
    val back = AvroJdbc.avro(spark, s"$out/part-*", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))))
    assert(back.rdd.getNumPartitions == 3)
    assert(back.count() == 100)
    assert(back.agg(sum("id")).head().getLong(0) == 4950L)
  }

  private val derbyUrl = {
    // embedded engine; keep Derby's chatter out of the repo root
    System.setProperty("derby.system.home", tmp("derby_home"))
    s"jdbc:derby:${tmp("derby")}/db;create=true"
  }

  test("jdbc roundtrip + partitioned scan (NumericBetweenParametersProvider shape)") {
    val df = spark.range(0, 1000).select(col("id"),
      (col("id") % 7).as("grp"), concat(lit("r"), col("id")).as("name"))
    AvroJdbc.writeJdbc(df, derbyUrl, "t_rt")
    val single = AvroJdbc.jdbc(spark, derbyUrl, "t_rt")
    assert(single.count() == 1000)
    val parts = AvroJdbc.jdbcPartitioned(spark, derbyUrl, "t_rt",
      partCol = "id", lower = 0L, upper = 999L, numParts = 4)
    // the split model: 4 bounded queries, one per Spark partition,
    // together covering every row exactly once
    assert(parts.rdd.getNumPartitions == 4)
    assert(parts.count() == 1000)
    assert(parts.agg(sum("id")).head().getLong(0) == 499500L)
  }

  test("jdbc scan pushes filters and prunes columns into the remote SQL") {
    AvroJdbc.writeJdbc(
      spark.range(0, 100).select(col("id"), (col("id") * 2).as("v")),
      derbyUrl, "t_push")
    val q = AvroJdbc.jdbc(spark, derbyUrl, "t_push")
      .filter(col("id") > 90).select("v")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(id,90)"), // filter reached the scan
      s"expected pushed filter in plan:\n$plan")
    assert(plan.contains("ReadSchema: struct<v:bigint>"), // column pruned
      s"expected pruned read schema in plan:\n$plan")
    assert(q.count() == 9)
  }

  test("exactly-once upsert sink: both idempotence layers hold under replay") {
    import spark.implicits._
    val table = "eo_t"
    AvroJdbc.ensureUpsertTables(derbyUrl, table, "k", Seq("v"))
    def readBack() = AvroJdbc.jdbc(spark, derbyUrl, s""""$table"""")
      .orderBy("k").as[(Long, Long)].collect().toSeq
    val b0 = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")

    assert(AvroJdbc.upsertBatch(b0, 0L, derbyUrl, table, "k", Seq("v"), "runA"))
    assert(readBack() === Seq((1L, 10L), (2L, 20L)))

    // layer (b): ledger — an already-applied (run, batch) is skipped wholesale
    assert(!AvroJdbc.upsertBatch(b0, 0L, derbyUrl, table, "k", Seq("v"), "runA"))
    assert(readBack() === Seq((1L, 10L), (2L, 20L)))

    // layer (a): merge idempotence — replay WITHOUT the ledger (crash
    // between data commit and ledger insert) lands on the identical state
    withDerby { c =>
      val st = c.createStatement()
      try st.executeUpdate("""DELETE FROM "graft_sink_ledger"""") finally st.close()
    }
    assert(AvroJdbc.upsertBatch(b0, 0L, derbyUrl, table, "k", Seq("v"), "runA"))
    assert(readBack() === Seq((1L, 10L), (2L, 20L)))

    // a later batch UPDATES matched keys and INSERTS new ones
    val b1 = Seq((2L, 22L), (3L, 30L)).toDF("k", "v")
    assert(AvroJdbc.upsertBatch(b1, 1L, derbyUrl, table, "k", Seq("v"), "runA"))
    assert(readBack() === Seq((1L, 10L), (2L, 22L), (3L, 30L)))

    // a FRESH run key (new checkpoint) replays through the merge, no dupes
    assert(AvroJdbc.upsertBatch(b1, 0L, derbyUrl, table, "k", Seq("v"), "runB"))
    assert(readBack() === Seq((1L, 10L), (2L, 22L), (3L, 30L)))
  }

  test("exactly-once sink end-to-end: streamed update-mode agg lands the batch totals") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val agg = mem.toDS().toDF("k", "x").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("x").as("s"))
    val ckpt = tmp("eo_ckpt")
    val q = AvroJdbc.startUpsertSink(agg, derbyUrl, "eo_stream_t",
      "k", Seq("n", "s"), ckpt)
    try {
      mem.addData((1L, 5L), (1L, 7L), (2L, 9L)); q.processAllAvailable()
      mem.addData((1L, 1L)); q.processAllAvailable() // cross-batch update
    } finally q.stop()
    val got = AvroJdbc.jdbc(spark, derbyUrl, """"eo_stream_t"""")
      .orderBy("k").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 13L), (2L, 1L, 9L)))
  }

  private def withDerby[T](f: java.sql.Connection => T): T = {
    val c = java.sql.DriverManager.getConnection(derbyUrl)
    try f(c) finally c.close()
  }
}
