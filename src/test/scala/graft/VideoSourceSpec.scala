package graft

import graft.sources.Video
import org.apache.spark.sql.functions._

/** Pins the MP4 (ISO BMFF) container contract (sources/Video.scala):
  * box-tree structure, big-endian field offsets, 16.16 geometry
  * encoding, malformed-input loudness, and executor-side parse. */
class VideoSourceSpec extends SparkSpec {

  test("writeMp4 emits a well-formed box tree parseMp4 walks back exactly") {
    for (id <- Seq(0L, 7L, 123L, 4999L)) {
      val bytes = Video.writeMp4(id)
      // top-level structure: ftyp then moov, sizes spanning the file
      assert(new String(bytes, 4, 4, "US-ASCII") === "ftyp")
      val ftypSize = java.nio.ByteBuffer.wrap(bytes).getInt(0)
      assert(new String(bytes, ftypSize + 4, 4, "US-ASCII") === "moov")
      val m = Video.parseMp4(bytes)
      assert(m.timescale === Video.timescaleOf(id))
      assert(m.durationTicks === Video.durationTicksOf(id))
      assert(m.width === Video.widthOf(id))
      assert(m.height === Video.heightOf(id))
    }
  }

  test("parse rejects malformed sizes loudly") {
    val bytes = Video.writeMp4(1L)
    val corrupt = bytes.clone()
    corrupt(0) = 0x7f.toByte // ftyp size becomes enormous
    intercept[IllegalArgumentException](Video.parseMp4(corrupt))
    intercept[RuntimeException](Video.parseMp4(Array[Byte](0, 0, 0, 8, 'f', 'r', 'e', 'e')))
  }

  test("binaryFile scan + partition-local decodeMeta matches formulas") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mp4_scan").toFile
    val ids = Seq(2L, 5L, 11L).toDF("doc_id")
    Video.mp4sFromDocIds(ids, "doc_id", dir.getPath)
    val got = Video.decodeMeta(Video.readBinary(spark, dir.getPath))
      .select(regexp_extract(col("path"), "doc_(\\d+)\\.mp4$", 1)
          .cast("long").as("id"),
        col("timescale"), col("duration_ticks"), col("duration_ms"),
        col("width"), col("height"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5)))).toMap
    assert(got.keySet === Set(2L, 5L, 11L))
    for ((id, (ts, ticks, ms, w, h)) <- got) {
      assert(ts === Video.timescaleOf(id))
      assert(ticks === Video.durationTicksOf(id))
      assert(ms === ticks.toLong * 1000L / ts)
      assert((w, h) === (Video.widthOf(id), Video.heightOf(id)))
    }
  }
}
