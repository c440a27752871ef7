package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins `Tables.events` against every physical layout the driver's fixture
  * generator has shipped for `events.ts` (round-7 postmortem: a regeneration
  * flipped TIMESTAMP(NANOS) → timestamp[us] NTZ and silently broke all 45
  * streaming/window/CEP/as-of gate queries). The loader contract: whatever
  * the file says, `ts` comes out as session-zoned TimestampType with
  * identical epoch-micros, so `withWatermark`/`unix_micros` always work and
  * the DuckDB oracle agrees bit-exactly.
  */
class FixtureLayoutSpec extends SparkSpec {

  private val micros = Seq(1700000000000000L, 1700000001500000L, 1700003600250000L)

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_fixture_$tag").toFile
    d.deleteOnExit(); d.getPath
  }

  private def readBack(dir: String): Seq[Long] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"loader must yield TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted.toSeq
  }

  test("timestamp[us] NTZ layout (round-7 fixture) normalizes to TimestampType") {
    val dir = tmpDir("ntz")
    import spark.implicits._
    micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(readBack(dir) == micros.sorted)
  }

  test("timestamp[us] UTC layout passes through unchanged") {
    val dir = tmpDir("utc")
    import spark.implicits._
    micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(readBack(dir) == micros.sorted)
  }

  test("nanos-as-long layout floor-divides to identical epoch-micros") {
    // Spark cannot WRITE parquet TIMESTAMP(NANOS); simulate what the
    // nanosAsLong read flag yields (raw int64 nanos as LongType) and pin the
    // ns→µs truncation normalizeTs applies — the same truncation DuckDB
    // applies reading NANOS files, which is what keeps oracles exact.
    import spark.implicits._
    val raw = micros.map(_ * 1000 + 999).toDF("ts") // sub-µs residue must truncate
    val out = Tables.normalizeTs(raw)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted.toSeq
      == micros.sorted)
  }

  test("all fixture tables keep their column names and (normalized) types " +
    "(regeneration drift tripwire)") {
    // The round-7 incident generalized: the driver can regenerate
    // /root/testdata at any time, and a silent type/name drift in ANY
    // table would strand query surfaces the way events.ts stranded
    // streaming. Timestamp flavor is normalized (NTZ vs UTC both read
    // fine in batch comparisons and hash-match the oracle; events.ts is
    // separately pinned strict below) so the known-benign flip cannot
    // false-alarm, while renames, widenings, and column drops stay loud.
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    def norm(dt: DataType): String = dt match {
      case TimestampType | TimestampNTZType => "timestamp*"
      case ArrayType(e, _) => s"array<${norm(e)}>"
      case other => other.simpleString
    }
    val expected = Map(
      "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
      "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
        "n_regionkey" -> "int"),
      "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
        "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"),
      "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
        "s_nationkey" -> "int", "s_acctbal" -> "double"),
      "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
        "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
        "p_retailprice" -> "double"),
      "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
        "o_orderstatus" -> "string", "o_totalprice" -> "double",
        "o_orderdate" -> "timestamp*", "o_orderpriority" -> "string"),
      "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
        "l_suppkey" -> "bigint", "l_linenumber" -> "int",
        "l_quantity" -> "double", "l_extendedprice" -> "double",
        "l_discount" -> "double", "l_tax" -> "double",
        "l_returnflag" -> "string", "l_linestatus" -> "string",
        "l_shipdate" -> "timestamp*"),
      "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp*",
        "user_id" -> "bigint", "event_type" -> "string",
        "value" -> "double", "props" -> "string"),
      "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
        "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
      "embeddings" -> Seq("vec_id" -> "bigint",
        "embedding" -> "array<float>", "label" -> "int"))
    Tables.all.foreach { t =>
      val got = Tables(spark, dir, t).schema.fields.toSeq
        .map(f => f.name -> norm(f.dataType))
      assert(got == expected(t),
        s"fixture table '$t' drifted:\n  got      $got\n  expected ${expected(t)}")
    }
  }

  test("the real driver fixture loads as TimestampType (drift tripwire)") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"driver fixture at $dir now ships a ts layout the loader does not " +
        s"normalize: ${df.schema("ts").dataType} — extend Tables.normalizeTs")
    // and a watermark must be acceptable on it (the exact r07 failure mode)
    val wm = df.withWatermark("ts", "1 hour")
    assert(wm.schema("ts").dataType == TimestampType)
  }
}
