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
