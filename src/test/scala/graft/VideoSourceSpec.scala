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

  test("stbl sample tables decode back to the fixture formulas (run-length stts)") {
    for (id <- Seq(0L, 3L, 16L, 123L, 4999L)) {
      val sm = Video.parseSamples(Video.writeMp4(id))
      val n = Video.nSamplesOf(id); val c1 = (n + 1) / 2
      assert(sm.nSamples === n)
      assert(sm.durationTicks ===
        c1.toLong * Video.delta1Of(id) + (n - c1).toLong * Video.delta2Of(id))
      val sizes = (1 to n).map(Video.sampleSizeOf(id, _))
      assert(sm.totalBytes === sizes.map(_.toLong).sum)
      assert(sm.maxSize === sizes.max)
      assert(sm.nKeyframes === (1 to n by Video.syncStrideOf(id)).size)
      assert(sm.chunkOffset === Video.chunkOffsetOf(id))
    }
  }

  test("uniform-size stsz short form is honored") {
    // hand-build a tree whose stsz uses sample_size != 0 (no per-sample list)
    def box(tag: String, p: Array[Byte]) = {
      val b = java.nio.ByteBuffer.allocate(8 + p.length)
      b.putInt(8 + p.length); b.put(tag.getBytes("US-ASCII")); b.put(p); b.array()
    }
    def full(ints: Int*) = {
      val b = java.nio.ByteBuffer.allocate(4 * ints.length)
      ints.foreach(b.putInt); b.array()
    }
    val stbl = box("stts", full(0, 1, 5, 40)) ++      // 5 samples @40 ticks
      box("stsz", full(0, 777, 5)) ++                 // uniform 777 bytes
      box("stss", full(0, 2, 1, 4)) ++
      box("stco", full(0, 1, 9999))
    val tree = box("moov", box("trak", box("mdia",
      box("minf", box("stbl", stbl)))))
    val sm = Video.parseSamples(tree)
    assert(sm === Video.Mp4Samples(5, 200L, 5L * 777, 777, 2, 9999L))
  }

  test("stsz/stts sample-count disagreement is loud") {
    def box(tag: String, p: Array[Byte]) = {
      val b = java.nio.ByteBuffer.allocate(8 + p.length)
      b.putInt(8 + p.length); b.put(tag.getBytes("US-ASCII")); b.put(p); b.array()
    }
    def full(ints: Int*) = {
      val b = java.nio.ByteBuffer.allocate(4 * ints.length)
      ints.foreach(b.putInt); b.array()
    }
    val stbl = box("stts", full(0, 1, 5, 40)) ++
      box("stsz", full(0, 0, 3, 10, 20, 30)) ++       // 3 != 5 samples
      box("stss", full(0, 1, 1)) ++ box("stco", full(0, 1, 1))
    val tree = box("moov", box("trak", box("mdia",
      box("minf", box("stbl", stbl)))))
    intercept[IllegalArgumentException](Video.parseSamples(tree))
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

  test("writeMp4Sized: formula sizes reproduce writeMp4 byte-identically; " +
    "parseSampleSizes round-trips explicit sizes") {
    Seq(0L, 3L, 7L, 12L).foreach { id =>
      val formula = (1 to Video.nSamplesOf(id)).map(Video.sampleSizeOf(id, _))
      assert(java.util.Arrays.equals(Video.writeMp4(id),
        Video.writeMp4Sized(id, formula)), s"id=$id")
      assert(Video.parseSampleSizes(Video.writeMp4(id)).toSeq === formula)
    }
    val custom = Seq(10, 20, 15, 99, 3)
    assert(Video.parseSampleSizes(Video.writeMp4Sized(9L, custom)).toSeq === custom)
  }

  test("mp4sPlantedNearDup: stbl walk + sizeFingerprint64(nSamples=64) " +
    "reproduces Planted.sig(_, 63) bit-exactly, planted pairs at kOf bits") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mp4_planted").toFile
    val ids = (0L until 40L).toSeq
    Video.mp4sPlantedNearDup(ids.toDF("doc_id"), "doc_id", dir.getPath)
    val got = Video.sizeFingerprint64(Video.readBinary(spark, dir.getPath), 64)
      .select(regexp_extract(col("path"), "doc_(\\d+)\\.mp4$", 1)
          .cast("long").as("id"),
        col("fingerprint"))
      .as[(Long, Long)].collect().toMap
    ids.foreach(id => assert(got(id) === graft.sources.Planted.sig(id, 63),
      s"id=$id"))
    ids.filter(_ % 7 == 3).foreach { d =>
      assert(java.lang.Long.bitCount(got(d) ^ got(d - 3)) ===
        graft.sources.Planted.kOf(d), s"planted pair ($d, ${d - 3})")
    }
  }

  test("family contract: video fingerprints ride SimHashIndex end-to-end — " +
    "two-delivery ingestSignatures over planted MP4s equals brute-force " +
    "Hamming on the 63-bit law, old_id from the indexed delivery") {
    import graft.operators.SimHashIndex
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mp4_shidx").toFile
    val ids = (0L until 60L).toSeq
    Video.mp4sPlantedNearDup(ids.toDF("doc_id"), "doc_id", dir.getPath)
    val fp = Video.sizeFingerprint64(Video.readBinary(spark, dir.getPath), 64)
      .select(regexp_extract(col("path"), "doc_(\\d+)\\.mp4$", 1)
          .cast("long").as("doc_id"),
        col("fingerprint"))
    val ref = SimHashIndex.Ref("vidspecidx", buckets = 4)
    SimHashIndex.drop(spark, ref)
    def ing(pred: org.apache.spark.sql.Column) =
      SimHashIndex.ingestSignatures(fp.filter(pred), "doc_id", "fingerprint",
        maxDist = 3, ref, delivery = java.util.UUID.randomUUID().toString)
        .as[(Long, Long, Long)].collect().toSet
    val d1 = ing(col("doc_id") % 2 === 0)
    val d2 = ing(col("doc_id") % 2 =!= 0)
    val brute = (for {
      a <- ids; b <- ids if a < b
      d = java.lang.Long.bitCount(graft.sources.Planted.sig(a, 63) ^
        graft.sources.Planted.sig(b, 63)) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(brute.nonEmpty, "planted fixture must fire")
    assert((d1 ++ d2).map(p => (p._1 min p._2, p._1 max p._2, p._3)) === brute)
    // cross-delivery orientation: old_id is the indexed (even) side
    assert(d2.filter(p => p._2 % 2 == 1).forall(p => p._1 % 2 == 0))
    SimHashIndex.drop(spark, ref)
  }
}
