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
}
