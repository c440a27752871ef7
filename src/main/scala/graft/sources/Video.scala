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

  /** Deterministic fixture formulas — shared by generator and oracle. */
  def timescaleOf(id: Long): Int = (600 + (id % 5) * 300).toInt
  def durationTicksOf(id: Long): Int = (1200 + id % 800).toInt
  def widthOf(id: Long): Int = (160 + (id % 8) * 40).toInt
  def heightOf(id: Long): Int = (120 + (id % 6) * 40).toInt

  private def box(tag: String, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length)
    b.put(tag.getBytes("US-ASCII"))
    b.put(payload)
    b.array()
  }

  /** Minimal valid MP4 header bytes for one id: ftyp + moov(mvhd,
    * trak(tkhd)). All multi-byte fields big-endian per ISO 14496-12. */
  def writeMp4(id: Long): Array[Byte] = {
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
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  /** Parsed container metadata. */
  final case class Mp4Meta(timescale: Int, durationTicks: Int,
                           width: Int, height: Int)

  /** Real ISO-BMFF atom walk: iterate sibling boxes (u32 size + fourcc),
    * descend containers, read mvhd/tkhd fields at version-aware offsets.
    * Throws on malformed sizes — corrupt media must be loud, not silent. */
  def parseMp4(bytes: Array[Byte]): Mp4Meta = {
    val buf = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    def children(from: Int, until: Int): Seq[(String, Int, Int)] = {
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
