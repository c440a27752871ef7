package graft

import graft.sources.Audio
import org.apache.spark.sql.functions._

/** Pins the REAL WAV audio contract (sources/Audio.scala): binaryFile
  * scan schema, AudioSystem container roundtrip losslessness, the
  * little-endian 16-bit sample layout, and executor-side decode. */
class AudioSourceSpec extends SparkSpec {

  test("WAV roundtrip: AudioSystem decodes the exact generated samples") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wav_gen").toFile
    val ids = Seq(3L, 10L).toDF("doc_id")
    Audio.wavsFromDocIds(ids, "doc_id", dir.getPath)
    for (id <- Seq(3L, 10L)) {
      val bytes = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, s"doc_$id.wav").toPath)
      val (rate, ch, frames, sum) = Audio.decodeWav(bytes)
      assert(rate === Audio.sampleRateOf(id))
      assert(ch === 1)
      assert(frames === Audio.framesOf(id).toLong)
      val expSum = (0 until Audio.framesOf(id)).map(Audio.sampleOf(id, _).toLong).sum
      assert(sum === expSum)
    }
  }

  test("binaryFile scan + partition-local decodeMeta matches formulas") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wav_scan").toFile
    val ids = Seq(0L, 1L, 2L, 7L).toDF("doc_id")
    Audio.wavsFromDocIds(ids, "doc_id", dir.getPath)
    // a non-wav file must be glob-filtered out of the scan
    java.nio.file.Files.write(
      new java.io.File(dir, "junk.txt").toPath, "not audio".getBytes)
    val got = Audio.decodeMeta(Audio.readBinary(spark, dir.getPath))
      .select(regexp_extract(col("path"), "doc_(\\d+)\\.wav$", 1)
          .cast("long").as("id"),
        col("sample_rate"), col("n_channels"), col("n_frames"), col("sample_sum"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 7L))
    for ((id, (rate, ch, frames, sum)) <- got) {
      assert(rate === Audio.sampleRateOf(id))
      assert(ch === 1)
      assert(frames === Audio.framesOf(id).toLong)
      assert(sum === (0 until Audio.framesOf(id)).map(Audio.sampleOf(id, _).toLong).sum)
    }
  }

  test("sample formula spans the signed 16-bit range (both signs hit)") {
    // exact endpoints: 31·0+7·0 ≡ 0 → -32768; 31·2113 = 65503 → +32735
    assert(Audio.sampleOf(0L, 0) === -32768)
    assert(Audio.sampleOf(2113L, 0) === 32735)
    val all = for {
      id <- 0L to 2500L by 13; i <- 0 until Audio.framesOf(id)
    } yield Audio.sampleOf(id, i)
    assert(all.forall(v => v >= -32768 && v <= 32767))
  }
}
