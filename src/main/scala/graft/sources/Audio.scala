package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL audio-column decode for multimodal pipelines — the audio sibling
  * of [[Images]] (SURVEY §2 multimodal brief). Everything here is
  * genuinely available and REAL, no stubs:
  *
  *  - WAV container encode/decode via JDK `javax.sound.sampled`
  *    (`AudioSystem` — part of `java.desktop`, headless-safe, no native
  *    audio device touched for file parsing);
  *  - the scan is Spark's built-in `binaryFile` source (path, length,
  *    content), the canonical pattern for opaque media columns: bytes
  *    stay columnar, decode runs partition-local via `mapPartitions`,
  *    payloads never touch the driver.
  *
  * The gate corpus is a deterministic synthetic PCM WAV per document
  * ([[wavsFromDocIds]]): sample rate, frame count, and every 16-bit
  * sample are pure functions of the id, so a DuckDB oracle replays the
  * decoded header fields AND the signed sample sum exactly — encode →
  * WAV container → AudioSystem decode → Spark rows verified bit-level
  * (PCM is lossless).
  */
object Audio {

  /** Deterministic fixture formulas — shared by the WAV generator and the
    * DuckDB oracle: mono 16-bit PCM, id-keyed. */
  def sampleRateOf(id: Long): Int = (8000 + (id % 3) * 4000).toInt
  def framesOf(id: Long): Int = (50 + id % 20).toInt
  /** Signed 16-bit sample i: ((31·id + 7·i) mod 2^16) − 2^15. */
  def sampleOf(id: Long, i: Int): Int =
    (((31L * id + 7L * i) % 65536L) - 32768L).toInt

  private def pcmFormat(rate: Float) =
    new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false) // 16-bit mono signed LE

  /** Write one `doc_<id>.wav` per input id into `outDir` (must exist) —
    * partition-local AudioSystem encode, no driver collection. */
  def wavsFromDocIds(ids: DataFrame, idCol: String, outDir: String): Unit =
    ids.select(col(idCol).cast("long")).foreachPartition {
      (rows: Iterator[Row]) =>
        rows.foreach { r =>
          val id = r.getLong(0)
          val n = framesOf(id)
          val bytes = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = sampleOf(id, i)
            bytes(2 * i) = (v & 0xff).toByte          // little-endian
            bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val in = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(bytes),
            pcmFormat(sampleRateOf(id).toFloat), n.toLong)
          javax.sound.sampled.AudioSystem.write(in,
            javax.sound.sampled.AudioFileFormat.Type.WAVE,
            new java.io.File(outDir, s"doc_$id.wav"))
        }
    }

  /** Write one 256-frame `doc_<id>.wav` per input id realizing the
    * PLANTED near-dup signature law ([[Planted]], 63-bit space) as that
    * clip's [[fingerprint64]] at nWindows = 64: 64 windows of 4 frames,
    * every frame in window w holding amplitude a(w), walking
    * a(w+1) = a(w) + 1 when signature bit w is set (E(w+1) > E(w) ⇔
    * a(w+1) > a(w) for positive amplitudes), −1 otherwise, from
    * a(0) = 1000 — amplitudes stay in [937, 1063]. decode →
    * fingerprint64 over these files reproduces [[Planted.sig]](id, 63)
    * bit-exactly. Partition-local encode, no driver collection. */
  def wavsPlantedNearDup(ids: DataFrame, idCol: String, outDir: String): Unit =
    ids.select(col(idCol).cast("long")).foreachPartition {
      (rows: Iterator[Row]) =>
        rows.foreach { r =>
          val id = r.getLong(0)
          val bytes = new Array[Byte](256 * 2)
          var a = 1000
          var w = 0
          while (w < 64) {
            var f = 0
            while (f < 4) {
              val i = w * 4 + f
              bytes(2 * i) = (a & 0xff).toByte // little-endian
              bytes(2 * i + 1) = ((a >> 8) & 0xff).toByte
              f += 1
            }
            if (w < 63) a += (if (Planted.sigBit(id, w, 63) == 1) 1 else -1)
            w += 1
          }
          val in = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(bytes),
            pcmFormat(16000f), 256L)
          javax.sound.sampled.AudioSystem.write(in,
            javax.sound.sampled.AudioFileFormat.Type.WAVE,
            new java.io.File(outDir, s"doc_$id.wav"))
        }
    }

  /** The real binary scan: Spark's binaryFile source over .wav files. */
  def readBinary(s: SparkSession, dir: String): DataFrame =
    s.read.format("binaryFile").option("pathGlobFilter", "*.wav").load(dir)

  /** Decode one WAV container's bytes via AudioSystem: (sampleRate,
    * channels, frames, signed-sample sum). Pure function of the bytes. */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Long, Long) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"gate fixtures are 16-bit LE PCM, got $fmt")
      val data = in.readAllBytes()
      var sum = 0L
      var i = 0
      while (i + 1 < data.length) {
        sum += ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toLong
        i += 2
      }
      (fmt.getSampleRate.toInt, fmt.getChannels, in.getFrameLength, sum)
    } finally in.close()
  }

  private val metaSchema = StructType(Seq(
    StructField("path", StringType), StructField("sample_rate", IntegerType),
    StructField("n_channels", IntegerType), StructField("n_frames", LongType),
    StructField("sample_sum", LongType)))

  /** Partition-local batched decode of a binaryFile frame — the real
    * AudioSystem parse runs inside the executors, one pass, no driver
    * collection (the contract [[graft.operators.Multimodal]] stubs,
    * made real for WAV). */
  def decodeMeta(binary: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(metaSchema)
    binary.select("path", "content").mapPartitions { rows =>
      rows.map { r =>
        val (rate, ch, frames, sum) = decodeWav(r.getAs[Array[Byte]]("content"))
        Row(r.getAs[String]("path"), rate, ch, frames, sum)
      }
    }(enc)
  }

  private val resampleSchema = StructType(Seq(
    StructField("path", StringType), StructField("src_rate", IntegerType),
    StructField("n_out", LongType), StructField("r_sum", LongType),
    StructField("r_chk", LongType)))

  private val featureSchema = StructType(Seq(
    StructField("path", StringType), StructField("n_windows", LongType),
    StructField("zc_total", LongType), StructField("energy_sum", LongType),
    StructField("energy_max", LongType)))

  /** Windowed FRAME FEATURES over 16-bit mono PCM — the audio
    * feature-extract stage of a multimodal pipeline (the classic
    * pre-neural descriptors, integer-exact so the gate replays them):
    * the clip is cut into ⌊n/window⌋ COMPLETE non-overlapping windows
    * (trailing partial window dropped), and per window the kernel
    * computes short-time ENERGY Σ v² and the ZERO-CROSSING count
    * (positions i in [1, window) with sign(v[i]) ≠ sign(v[i−1]);
    * sign(0) counts as non-negative, so a crossing is strictly
    * `(v[i−1] < 0) ≠ (v[i] < 0)`). Emitted per clip: window count,
    * total crossings, summed energy, max window energy — the shapes a
    * VAD / silence-trim / quality-filter stage consumes. Partition-local
    * over the binaryFile scan, payloads never touch the driver. */
  def frameFeatures(binary: DataFrame, window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    binary.select("path", "content").mapPartitions { rows =>
      rows.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("content")))
        try {
          val fmt = in.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1, s"features expect 16-bit LE mono PCM, got $fmt")
          val data = in.readAllBytes()
          val n = data.length / 2
          val nWin = n / window
          def sample(i: Int): Long =
            ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
          var zc = 0L
          var eSum = 0L
          var eMax = 0L
          var w = 0
          while (w < nWin) {
            var e = 0L
            var i = w * window
            val end = i + window
            var prevNeg = sample(i) < 0
            e += sample(i) * sample(i)
            i += 1
            while (i < end) {
              val v = sample(i)
              val neg = v < 0
              if (neg != prevNeg) zc += 1
              prevNeg = neg
              e += v * v
              i += 1
            }
            eSum += e
            if (e > eMax) eMax = e
            w += 1
          }
          Row(r.getAs[String]("path"), nWin.toLong, zc, eSum, eMax)
        } finally in.close()
      }
    }(enc)
  }

  /** Energy-gradient audio FINGERPRINT — the Haitsma–Kalker device ("A
    * Highly Robust Audio Fingerprint", 2002: per-frame energies, bits =
    * the sign of the energy DERIVATIVE; their 33-band × time form
    * collapses to the time-gradient on mono PCM): the first
    * nWindows·⌊n/nWindows⌋ samples split into `nWindows` equal windows,
    * E(w) = Σ v² over window w (exact longs), and bit w of the
    * fingerprint is set iff E(w+1) > E(w) — nWindows−1 bits in a long
    * (nWindows ≤ 64). Identical audio → identical fingerprint;
    * perceptually-similar audio differs in few bits; dedup on exact
    * fingerprint match is the audio sibling of [[Images.dHash64]]'s
    * recipe. Partition-local real AudioSystem decode, payloads never
    * touch the driver. Output: (path, n_windows, fingerprint). */
  def fingerprint64(binary: DataFrame, nWindows: Int): DataFrame = {
    require(nWindows >= 2 && nWindows <= 64,
      s"nWindows must be in [2, 64], got $nWindows")
    val fpSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("n_windows", LongType),
      StructField("fingerprint", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(fpSchema)
    binary.select("path", "content").mapPartitions { rows =>
      rows.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("content")))
        try {
          val fmt = in.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1, s"fingerprint expects 16-bit LE mono PCM, got $fmt")
          val data = in.readAllBytes()
          val n = data.length / 2
          val wl = n / nWindows
          require(wl >= 1, s"clip too short: $n samples for $nWindows windows")
          def sample(i: Int): Long =
            ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
          val e = new Array[Long](nWindows)
          var w = 0
          while (w < nWindows) {
            var acc = 0L
            var i = w * wl
            val end = i + wl
            while (i < end) { val v = sample(i); acc += v * v; i += 1 }
            e(w) = acc
            w += 1
          }
          var fp = 0L
          var b = 0
          while (b < nWindows - 1) {
            if (e(b + 1) > e(b)) fp |= (1L << b)
            b += 1
          }
          Row(r.getAs[String]("path"), nWindows.toLong, fp)
        } finally in.close()
      }
    }(enc)
  }

  /** NEAREST-NEIGHBOR sample-rate conversion of 16-bit mono PCM to
    * `dstRate` — the audio preprocessing sibling of
    * [[Images.resizeNearest]] (training pipelines normalize clips to one
    * rate before featurization): n_out = ⌊n·dstRate/srcRate⌋ output
    * frames, output sample j reads input sample ⌊j·srcRate/dstRate⌋
    * (always in range: j < n_out ⇒ src < n). Partition-local
    * mapPartitions over the binaryFile scan, real AudioSystem decode,
    * payloads never touch the driver. Summarized as (n_out, sum,
    * position-weighted checksum) — the checksum weights sample j by j+1,
    * so a mapping or ordering error cannot cancel the way a plain sum
    * lets it (the [[Images.resizeNearestSums]] device). An identity-rate
    * resample reproduces the original frame count and sample sum
    * exactly (law-spec'd). */
  def resampleNearestSums(binary: DataFrame, dstRate: Int): DataFrame = {
    require(dstRate >= 1)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(resampleSchema)
    binary.select("path", "content").mapPartitions { rows =>
      rows.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("content")))
        try {
          val fmt = in.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1, s"resample expects 16-bit LE mono PCM, got $fmt")
          val data = in.readAllBytes()
          val srcRate = fmt.getSampleRate.toInt
          val n = data.length / 2
          val nOut = n.toLong * dstRate / srcRate
          var sum = 0L
          var chk = 0L
          var j = 0L
          while (j < nOut) {
            val src = (j * srcRate / dstRate).toInt
            val v = ((data(2 * src) & 0xff) | (data(2 * src + 1) << 8)).toShort.toLong
            sum += v
            chk += v * (j + 1)
            j += 1
          }
          Row(r.getAs[String]("path"), srcRate, nOut, sum, chk)
        } finally in.close()
      }
    }(enc)
  }
}
