package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL video-container metadata decode — the third modality next to
  * [[Images]] (PNG/ImageIO) and [[Audio]] (WAV/AudioSystem). No JVM
  * video CODEC exists in this environment (and none is needed for the
  * metadata stage of a training pipeline): what IS real here is the
  * ISO BMFF (MP4) container format itself — a big-endian box/atom tree
  * defined by public spec (ISO/IEC 14496-12) — written and parsed
  * byte-level with no library at all:
  *
  *  - [[writeMp4]] emits a minimal `ftyp` + `moov(mvhd, trak(tkhd))`
  *    box tree — the standard header structure every MP4 probe tool
  *    reads (duration/timescale from `mvhd`, track geometry from
  *    `tkhd`'s 16.16 fixed-point width/height);
  *  - [[parseMp4]] is a real atom-walker: u32 size + fourcc, container
  *    descent, version-aware field offsets — the same walk ffprobe or
  *    mp4dump performs for these boxes;
  *  - the scan is Spark's `binaryFile` source; the walk runs
  *    partition-local via `mapPartitions` (bytes never hit the driver).
  *
  * Frame EXTRACTION stays out of scope (no codec) — frame SAMPLING over
  * decoded metadata is qa5's operator. The gate corpus derives every
  * field from doc_id, so a DuckDB oracle replays the parsed metadata
  * (including the integer duration_ms division) bit-exactly.
  */
object Video {

  /** Bumped whenever [[writeMp4]]'s byte layout changes — cached fixture
    * directories embed it so stale layouts can't be read by newer parsers.
    * v2: added mdia(mdhd, minf(stbl(stts/stsz/stss/stsc/stco))). */
  val FixtureVersion = 2

  /** Deterministic fixture formulas — shared by generator and oracle. */
  def timescaleOf(id: Long): Int = (600 + (id % 5) * 300).toInt
  def durationTicksOf(id: Long): Int = (1200 + id % 800).toInt
  def widthOf(id: Long): Int = (160 + (id % 8) * 40).toInt
  def heightOf(id: Long): Int = (120 + (id % 6) * 40).toInt

  // -- sample-table (stbl) fixture formulas, all id-derived ------------
  def nSamplesOf(id: Long): Int = (8 + id % 17).toInt
  /** stts run 1: first ceil(n/2) samples at this delta. */
  def delta1Of(id: Long): Int = (100 + id % 50).toInt
  /** stts run 2: remaining samples at this delta. */
  def delta2Of(id: Long): Int = (200 + id % 30).toInt
  def sampleSizeOf(id: Long, i: Int): Int = (500 + (id * 31 + i * 7) % 997).toInt
  /** Sync-sample stride: samples 1, 1+k, 1+2k, … are keyframes. */
  def syncStrideOf(id: Long): Int = (2 + id % 3).toInt
  def chunkOffsetOf(id: Long): Long = 4096L + id % 512

  private def box(tag: String, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length)
    b.put(tag.getBytes("US-ASCII"))
    b.put(payload)
    b.array()
  }

  /** Minimal valid MP4 header bytes for one id: ftyp + moov(mvhd,
    * trak(tkhd)). All multi-byte fields big-endian per ISO 14496-12. */
  def writeMp4(id: Long): Array[Byte] =
    mp4Tree(id, (1 to nSamplesOf(id)).map(sampleSizeOf(id, _)))

  /** [[writeMp4]] with EXPLICIT per-sample sizes (everything else stays
    * the id-derived formulas — [[writeMp4]] delegates here with the
    * formula sizes, byte-identical). The planted near-dup fixture feeds
    * controlled sample-size walks through this. */
  def writeMp4Sized(id: Long, sizes: Seq[Int]): Array[Byte] = {
    require(sizes.nonEmpty, "at least one sample")
    mp4Tree(id, sizes)
  }

  private def mp4Tree(id: Long, sizes: Seq[Int]): Array[Byte] = {
    val ftyp = box("ftyp", {
      val b = java.nio.ByteBuffer.allocate(8)
      b.put("isom".getBytes("US-ASCII")); b.putInt(0)
      b.array()
    })
    val mvhd = box("mvhd", {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0)                      // version 0 + flags
      b.putInt(0).putInt(0)            // creation/modification time
      b.putInt(timescaleOf(id))
      b.putInt(durationTicksOf(id))
      b.putInt(0x00010000)             // rate 1.0 (16.16)
      b.putShort(0x0100.toShort)       // volume 1.0 (8.8)
      b.position(b.position() + 10)    // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt)             // identity matrix
      b.position(b.position() + 24)    // pre_defined
      b.putInt(2)                      // next_track_ID
      b.array()
    })
    val tkhd = box("tkhd", {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(7)                      // version 0 + flags: enabled|in-movie|in-preview
      b.putInt(0).putInt(0)            // creation/modification time
      b.putInt(1)                      // track_ID
      b.putInt(0)                      // reserved
      b.putInt(durationTicksOf(id))
      b.putLong(0L)                    // reserved
      b.putShort(0).putShort(0)        // layer, alternate_group
      b.putShort(0).putShort(0)        // volume (video track = 0), reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt)             // identity matrix
      b.putInt(widthOf(id) << 16)      // width, 16.16 fixed
      b.putInt(heightOf(id) << 16)     // height, 16.16 fixed
      b.array()
    })
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd ++ mdiaOf(id, sizes)))
  }

  /** `mdia(mdhd, minf(stbl(stts, stsz, stss, stsc, stco)))` — the sample
    * tables every real demuxer walks to locate frames (ISO 14496-12 §8.5–
    * §8.7). All entries id-derived so a SQL oracle replays the decode. */
  private def mdiaOf(id: Long, sizes: Seq[Int]): Array[Byte] = {
    val n = sizes.length
    val c1 = (n + 1) / 2
    val mdhd = box("mdhd", {
      val b = java.nio.ByteBuffer.allocate(24)
      b.putInt(0)                      // version 0 + flags
      b.putInt(0).putInt(0)            // creation/modification time
      b.putInt(timescaleOf(id))
      b.putInt(c1 * delta1Of(id) + (n - c1) * delta2Of(id))
      b.putShort(0x55c4.toShort)       // language 'und'
      b.putShort(0)                    // pre_defined
      b.array()
    })
    val stts = box("stts", {
      val runs = if (n - c1 > 0) Seq((c1, delta1Of(id)), (n - c1, delta2Of(id)))
                 else Seq((c1, delta1Of(id)))
      val b = java.nio.ByteBuffer.allocate(8 + 8 * runs.length)
      b.putInt(0); b.putInt(runs.length)
      runs.foreach { case (c, d) => b.putInt(c); b.putInt(d) }
      b.array()
    })
    val stsz = box("stsz", {
      val b = java.nio.ByteBuffer.allocate(12 + 4 * n)
      b.putInt(0); b.putInt(0)         // ver/flags; sample_size=0 → per-sample
      b.putInt(n)
      sizes.foreach(b.putInt)
      b.array()
    })
    val stss = box("stss", {
      val k = syncStrideOf(id)
      val syncs = 1 to n by k
      val b = java.nio.ByteBuffer.allocate(8 + 4 * syncs.length)
      b.putInt(0); b.putInt(syncs.length)
      syncs.foreach(b.putInt)
      b.array()
    })
    val stsc = box("stsc", {
      val b = java.nio.ByteBuffer.allocate(20)
      b.putInt(0); b.putInt(1)
      b.putInt(1); b.putInt(n); b.putInt(1) // first_chunk, samples/chunk, sdi
      b.array()
    })
    val stco = box("stco", {
      val b = java.nio.ByteBuffer.allocate(12)
      b.putInt(0); b.putInt(1)
      b.putInt(chunkOffsetOf(id).toInt)
      b.array()
    })
    box("mdia", mdhd ++ box("minf", box("stbl", stts ++ stsz ++ stss ++ stsc ++ stco)))
  }

  /** Parsed container metadata. */
  final case class Mp4Meta(timescale: Int, durationTicks: Int,
                           width: Int, height: Int)

  /** Sibling-box walk over `[from, until)`: u32 size + fourcc per box.
    * Throws on malformed sizes — corrupt media must be loud, not silent. */
  private def boxChildren(bytes: Array[Byte], from: Int, until: Int): Seq[(String, Int, Int)] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    var off = from
    val out = Seq.newBuilder[(String, Int, Int)]
    while (off + 8 <= until) {
      val size = buf.getInt(off)
      require(size >= 8 && off + size <= until, s"malformed box size $size @$off")
      val tag = new String(bytes, off + 4, 4, "US-ASCII")
      out += ((tag, off + 8, off + size))
      off += size
    }
    out.result()
  }

  def parseMp4(bytes: Array[Byte]): Mp4Meta = {
    val buf = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    def children(from: Int, until: Int) = boxChildren(bytes, from, until)
    val moov = children(0, bytes.length)
      .collectFirst { case ("moov", s, e) => (s, e) }
      .getOrElse(sys.error("no moov box"))
    val boxes = children(moov._1, moov._2)
    val (mvhdS, _) = boxes.collectFirst { case ("mvhd", s, e) => (s, e) }
      .getOrElse(sys.error("no mvhd box"))
    val mvhdVer = buf.get(mvhdS) & 0xff
    require(mvhdVer == 0, s"mvhd version $mvhdVer unsupported (v0 fixtures)")
    val timescale = buf.getInt(mvhdS + 12)
    val duration = buf.getInt(mvhdS + 16)
    val (trakS, trakE) = boxes.collectFirst { case ("trak", s, e) => (s, e) }
      .getOrElse(sys.error("no trak box"))
    val (tkhdS, tkhdE) = children(trakS, trakE)
      .collectFirst { case ("tkhd", s, e) => (s, e) }
      .getOrElse(sys.error("no tkhd box"))
    // width/height are the LAST two u32 of tkhd regardless of version
    val width = buf.getInt(tkhdE - 8) >>> 16
    val height = buf.getInt(tkhdE - 4) >>> 16
    Mp4Meta(timescale, duration, width, height)
  }

  /** Decoded sample-table aggregates (stbl — ISO 14496-12 §8.5–§8.7). */
  final case class Mp4Samples(nSamples: Int, durationTicks: Long,
                              totalBytes: Long, maxSize: Int,
                              nKeyframes: Int, chunkOffset: Long)

  /** Real stbl decode: walk moov/trak/mdia/minf/stbl, then
    *  - `stts`: run-length (count, delta) pairs → sample count + total
    *    decode duration (the demuxer's timestamp ladder);
    *  - `stsz`: per-sample byte sizes (uniform-size short form honored);
    *  - `stss`: sync-sample (keyframe) numbers;
    *  - `stco`: chunk offsets (first one returned — seek base).
    * This is the exact walk a frame-seeking reader performs before it
    * touches any codec. */
  def parseSamples(bytes: Array[Byte]): Mp4Samples = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    def one(tag: String, cs: Seq[(String, Int, Int)]): (Int, Int) =
      cs.collectFirst { case (`tag`, s, e) => (s, e) }
        .getOrElse(sys.error(s"no $tag box"))
    val moov = one("moov", boxChildren(bytes, 0, bytes.length))
    val trak = one("trak", boxChildren(bytes, moov._1, moov._2))
    val mdia = one("mdia", boxChildren(bytes, trak._1, trak._2))
    val minf = one("minf", boxChildren(bytes, mdia._1, mdia._2))
    val stblSpan = one("stbl", boxChildren(bytes, minf._1, minf._2))
    val stbl = boxChildren(bytes, stblSpan._1, stblSpan._2)

    val (sttsS, _) = one("stts", stbl)
    val nRuns = buf.getInt(sttsS + 4)
    var n = 0; var dur = 0L
    (0 until nRuns).foreach { i =>
      val c = buf.getInt(sttsS + 8 + i * 8)
      val d = buf.getInt(sttsS + 12 + i * 8)
      n += c; dur += c.toLong * d
    }

    val (stszS, _) = one("stsz", stbl)
    val uniform = buf.getInt(stszS + 4)
    val count = buf.getInt(stszS + 8)
    require(count == n, s"stsz count $count != stts sample count $n")
    var total = 0L; var maxSz = 0
    if (uniform != 0) { total = uniform.toLong * count; maxSz = uniform }
    else (0 until count).foreach { i =>
      val sz = buf.getInt(stszS + 12 + i * 4)
      total += sz; if (sz > maxSz) maxSz = sz
    }

    val (stssS, _) = one("stss", stbl)
    val nSync = buf.getInt(stssS + 4)

    val (stcoS, _) = one("stco", stbl)
    require(buf.getInt(stcoS + 4) >= 1, "empty stco")
    val off0 = buf.getInt(stcoS + 8).toLong & 0xffffffffL

    Mp4Samples(n, dur, total, maxSz, nSync, off0)
  }

  private val samplesSchema = StructType(Seq(
    StructField("path", StringType), StructField("n_samples", IntegerType),
    StructField("duration_ticks", LongType),
    StructField("total_bytes", LongType),
    StructField("max_sample_size", IntegerType),
    StructField("n_keyframes", IntegerType),
    StructField("chunk_offset", LongType)))

  /** Partition-local batched stbl walk over a binaryFile frame. */
  def decodeSamples(binary: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(samplesSchema)
    binary.select("path", "content").mapPartitions { rows =>
      rows.map { r =>
        val m = parseSamples(r.getAs[Array[Byte]]("content"))
        Row(r.getAs[String]("path"), m.nSamples, m.durationTicks,
          m.totalBytes, m.maxSize, m.nKeyframes, m.chunkOffset)
      }
    }(enc)
  }

  /** Per-sample sizes from the stsz box — the same stbl walk as
    * [[parseSamples]], returning the raw size sequence (uniform-size
    * tables expand). */
  def parseSampleSizes(bytes: Array[Byte]): Array[Int] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    def one(tag: String, cs: Seq[(String, Int, Int)]): (Int, Int) =
      cs.collectFirst { case (`tag`, s, e) => (s, e) }
        .getOrElse(sys.error(s"no $tag box"))
    val moov = one("moov", boxChildren(bytes, 0, bytes.length))
    val trak = one("trak", boxChildren(bytes, moov._1, moov._2))
    val mdia = one("mdia", boxChildren(bytes, trak._1, trak._2))
    val minf = one("minf", boxChildren(bytes, mdia._1, mdia._2))
    val stblSpan = one("stbl", boxChildren(bytes, minf._1, minf._2))
    val (stszS, _) = one("stsz", boxChildren(bytes, stblSpan._1, stblSpan._2))
    val uniform = buf.getInt(stszS + 4)
    val count = buf.getInt(stszS + 8)
    if (uniform != 0) Array.fill(count)(uniform)
    else Array.tabulate(count)(i => buf.getInt(stszS + 12 + i * 4))
  }

  /** Sample-size-gradient video FINGERPRINT — the container-level
    * sibling of [[Audio.fingerprint64]] (Haitsma–Kalker's sign-of-the-
    * derivative device over the per-sample BYTE SIZES the stsz table
    * carries, instead of PCM energies): encoded frame sizes track
    * content complexity, so the size-gradient sequence fingerprints the
    * encoded stream without any codec — exactly what this environment's
    * no-video-codec contract allows to be REAL (the stbl walk is the
    * real ISO 14496-12 parse; only pixel decode is out of scope). Bit w
    * set iff size(w+2) > size(w+1) over the first `nSamples` samples
    * (1-indexed tables), nSamples − 1 bits in a long. Partition-local
    * walk over a binaryFile frame. Output: (path, fingerprint). */
  def sizeFingerprint64(binary: DataFrame, nSamples: Int): DataFrame = {
    require(nSamples >= 2 && nSamples <= 64,
      s"nSamples must be in [2, 64], got $nSamples")
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("fingerprint", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    binary.select("path", "content").mapPartitions { rows =>
      rows.map { r =>
        val sizes = parseSampleSizes(r.getAs[Array[Byte]]("content"))
        require(sizes.length >= nSamples,
          s"clip too short: ${sizes.length} samples for $nSamples")
        var fp = 0L
        var w = 0
        while (w < nSamples - 1) {
          if (sizes(w + 1) > sizes(w)) fp |= (1L << w)
          w += 1
        }
        Row(r.getAs[String]("path"), fp)
      }
    }(enc)
  }

  /** Write one 64-sample `doc_<id>.mp4` per input id realizing the
    * PLANTED near-dup signature law ([[Planted]], 63-bit space) as that
    * clip's [[sizeFingerprint64]] at nSamples = 64: sample sizes walk
    * size(w+1) = size(w) + 1 when signature bit w is set, −1 otherwise,
    * from size(0) = 1000 — the video sibling of
    * [[Audio.wavsPlantedNearDup]]'s amplitude walk. */
  def mp4sPlantedNearDup(ids: DataFrame, idCol: String, outDir: String): Unit =
    ids.select(col(idCol).cast("long")).foreachPartition {
      (rows: Iterator[Row]) =>
        rows.foreach { r =>
          val id = r.getLong(0)
          val sizes = new Array[Int](64)
          sizes(0) = 1000
          var w = 0
          while (w < 63) {
            sizes(w + 1) = sizes(w) +
              (if (Planted.sigBit(id, w, 63) == 1) 1 else -1)
            w += 1
          }
          java.nio.file.Files.write(
            new java.io.File(outDir, s"doc_$id.mp4").toPath,
            writeMp4Sized(id, sizes.toSeq))
        }
    }

  /** Write one `doc_<id>.mp4` per input id into `outDir` (must exist) —
    * partition-local, no driver collection. */
  def mp4sFromDocIds(ids: DataFrame, idCol: String, outDir: String): Unit =
    ids.select(col(idCol).cast("long")).foreachPartition {
      (rows: Iterator[Row]) =>
        rows.foreach { r =>
          val id = r.getLong(0)
          java.nio.file.Files.write(
            new java.io.File(outDir, s"doc_$id.mp4").toPath, writeMp4(id))
        }
    }

  /** The real binary scan over .mp4 files. */
  def readBinary(s: SparkSession, dir: String): DataFrame =
    s.read.format("binaryFile").option("pathGlobFilter", "*.mp4").load(dir)

  private val metaSchema = StructType(Seq(
    StructField("path", StringType), StructField("timescale", IntegerType),
    StructField("duration_ticks", IntegerType),
    StructField("duration_ms", LongType),
    StructField("width", IntegerType), StructField("height", IntegerType)))

  /** Partition-local batched atom walk over a binaryFile frame;
    * duration_ms = ticks·1000 / timescale in integer arithmetic (both
    * engines replay it exactly). */
  def decodeMeta(binary: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(metaSchema)
    binary.select("path", "content").mapPartitions { rows =>
      rows.map { r =>
        val m = parseMp4(r.getAs[Array[Byte]]("content"))
        Row(r.getAs[String]("path"), m.timescale, m.durationTicks,
          m.durationTicks.toLong * 1000L / m.timescale,
          m.width, m.height)
      }
    }(enc)
  }
}
