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

  test("resampleNearestSums: identity rate reproduces frames and sum; " +
    "2x upsample duplicates each sample, brute-checked") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wav_rsp").toFile
    val ids = Seq(3L, 4L, 5L) // rates 12000, 8000, 16000 — all three ratios
    Audio.wavsFromDocIds(ids.toDF("doc_id"), "doc_id", dir.getPath)
    def got(dst: Int) = Audio.resampleNearestSums(
        Audio.readBinary(spark, dir.getPath), dst)
      .select(regexp_extract(col("path"), "doc_(\\d+)\\.wav$", 1)
          .cast("long").as("id"),
        col("src_rate"), col("n_out"), col("r_sum"), col("r_chk"))
      .as[(Long, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // brute replay of the mapping from the fixture formulas
    def want(id: Long, dst: Int) = {
      val rate = Audio.sampleRateOf(id)
      val n = Audio.framesOf(id)
      val nOut = n.toLong * dst / rate
      val vs = (0L until nOut).map(j => Audio.sampleOf(id, (j * rate / dst).toInt).toLong)
      (rate, nOut, vs.sum, vs.zipWithIndex.map { case (v, j) => v * (j + 1) }.sum)
    }
    for (dst <- Seq(16000, 8000, 11025); id <- ids)
      assert(got(dst)(id) === want(id, dst), s"id=$id dst=$dst")
    // identity law: resampling doc 5 (16 kHz) to 16 kHz reproduces the
    // original frame count and plain sample sum
    val (_, nOut, sum, _) = want(5L, 16000)
    assert(nOut === Audio.framesOf(5L).toLong)
    assert(sum === (0 until Audio.framesOf(5L)).map(Audio.sampleOf(5L, _).toLong).sum)
  }

  test("frameFeatures: windows, energy, and zero crossings brute-checked " +
    "against the formulas") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wav_feat").toFile
    val ids = Seq(3L, 7L, 12L)
    Audio.wavsFromDocIds(ids.toDF("doc_id"), "doc_id", dir.getPath)
    for (window <- Seq(8, 16)) {
      val got = Audio.frameFeatures(Audio.readBinary(spark, dir.getPath), window)
        .select(regexp_extract(col("path"), "doc_(\\d+)\\.wav$", 1)
            .cast("long").as("id"),
          col("n_windows"), col("zc_total"), col("energy_sum"), col("energy_max"))
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      ids.foreach { id =>
        val n = Audio.framesOf(id)
        val nWin = n / window
        val wins = (0 until nWin).map { w =>
          val vs = (w * window until (w + 1) * window)
            .map(Audio.sampleOf(id, _).toLong)
          val e = vs.map(v => v * v).sum
          val zc = vs.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
          (e, zc.toLong)
        }
        val want = (nWin.toLong, wins.map(_._2).sum, wins.map(_._1).sum,
          if (wins.isEmpty) 0L else wins.map(_._1).max)
        assert(got(id) === want, s"id=$id window=$window")
      }
    }
  }

  test("fingerprint64: energy-gradient bits brute-checked against the " +
    "generator formulas; identical clips collide, window-count bounds hold") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wav_fp").toFile
    val ids = Seq(3L, 7L, 12L, 23L)
    Audio.wavsFromDocIds(ids.toDF("doc_id"), "doc_id", dir.getPath)
    val got = Audio.fingerprint64(Audio.readBinary(spark, dir.getPath),
        nWindows = 16)
      .select(regexp_extract(col("path"), "doc_(\\d+)\\.wav$", 1)
          .cast("long").as("id"), col("n_windows"), col("fingerprint"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    ids.foreach { id =>
      val n = Audio.framesOf(id)
      val wl = n / 16
      val e = (0 until 16).map { w =>
        (w * wl until (w + 1) * wl)
          .map { i => val v = Audio.sampleOf(id, i).toLong; v * v }.sum
      }
      var want = 0L
      for (b <- 0 until 15) if (e(b + 1) > e(b)) want |= (1L << b)
      assert(got(id) === ((16L, want)), s"id=$id")
      assert((want >> 15) === 0L, "only nWindows-1 bits may be set")
    }
    // byte-identical clips must collide (the dedup premise)
    val dir2 = java.nio.file.Files.createTempDirectory("wav_fp2").toFile
    Audio.wavsFromDocIds(Seq(3L).toDF("doc_id"), "doc_id", dir2.getPath)
    val again = Audio.fingerprint64(Audio.readBinary(spark, dir2.getPath), 16)
      .select("fingerprint").as[Long].head()
    assert(again === got(3L)._2)
    intercept[IllegalArgumentException] {
      Audio.fingerprint64(Audio.readBinary(spark, dir.getPath), nWindows = 65)
    }
  }

  test("wavsPlantedNearDup: decode + fingerprint64(nWindows=64) " +
    "reproduces Planted.sig(_, 63) bit-exactly, planted pairs at kOf bits") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wav_planted").toFile
    val ids = (0L until 40L).toSeq
    Audio.wavsPlantedNearDup(ids.toDF("doc_id"), "doc_id", dir.getPath)
    val got = Audio.fingerprint64(Audio.readBinary(spark, dir.getPath), 64)
      .select(regexp_extract(col("path"), "doc_(\\d+)\\.wav$", 1)
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
