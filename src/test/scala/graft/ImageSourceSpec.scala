package graft

import graft.sources.Images
import org.apache.spark.sql.functions._

/** Pins the REAL image-source contract (sources/Images.scala): the
  * format("image") frame schema, the BGR row-major byte layout (which
  * qdf's order-independent byte sum cannot see), decode losslessness for
  * PNG, and the byteSum builtin composition. */
class ImageSourceSpec extends SparkSpec {

  private def writePng(dir: java.io.File, name: String,
                       w: Int, h: Int)(rgb: (Int, Int) => Int): Unit = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    javax.imageio.ImageIO.write(img, "png", new java.io.File(dir, name))
  }

  test("format(\"image\") exposes the documented mllib frame schema") {
    val dir = java.nio.file.Files.createTempDirectory("img_schema").toFile
    writePng(dir, "one.png", 2, 2)((_, _) => 0x010203)
    val df = Images.read(spark, dir.getPath)
    assert(df.schema === Images.schema)
  }

  test("decode is BGR row-major and lossless for PNG") {
    val dir = java.nio.file.Files.createTempDirectory("img_bgr").toFile
    // 2x1: pixel (0,0) = r10 g20 b30, pixel (1,0) = r40 g50 b60
    writePng(dir, "two.png", 2, 1)((x, _) =>
      if (x == 0) (10 << 16) | (20 << 8) | 30 else (40 << 16) | (50 << 8) | 60)
    val r = Images.read(spark, dir.getPath)
      .select(col("image.height"), col("image.width"), col("image.nChannels"),
        col("image.mode"), col("image.data")).head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) === (1, 2, 3, Images.CV_8UC3))
    // BGR within each pixel, pixels row-major left→right
    assert(r.getAs[Array[Byte]](4).toSeq === Seq[Byte](30, 20, 10, 60, 50, 40))
  }

  test("generator formula roundtrips through PNG + ImageIO exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("img_gen").toFile
    val ids = Seq(7L, 12L).toDF("doc_id")
    Images.pngsFromDocIds(ids, "doc_id", dir.getPath)
    val got = Images.read(spark, dir.getPath)
      .select(regexp_extract(col("image.origin"), "doc_(\\d+)\\.png$", 1)
          .cast("long").as("id"),
        col("image.height"), col("image.width"), col("image.data"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3).toSeq))).toMap
    for (id <- Seq(7L, 12L)) {
      val (h, w, data) = got(id)
      assert((h, w) === (Images.heightOf(id), Images.widthOf(id)))
      // expected bytes: row-major pixels, BGR per pixel, exact components
      val exp = for {
        y <- 0 until h; x <- 0 until w; c <- Seq(2, 1, 0)
      } yield Images.componentOf(id, x, y, c).toByte
      assert(data === exp)
    }
  }

  test("byteSum sums unsigned bytes via builtins only") {
    import spark.implicits._
    val df = Seq(Array[Byte](0, 1, -1, 127, -128), Array.emptyByteArray)
      .toDF("b")
    val got = df.select(Images.byteSum(col("b")).as("s"))
      .as[Long].collect().toSeq.sorted
    // unsigned: 0 + 1 + 255 + 127 + 128 = 511; empty = 0
    assert(got === Seq(0L, 511L))
  }

  test("resizeNearestSums: identity dims reproduce the raw bytes; known " +
    "2x1 -> 1x1 takes the left pixel") {
    val dir = java.nio.file.Files.createTempDirectory("img_rsz").toFile
    writePng(dir, "two.png", 2, 1)((x, _) =>
      if (x == 0) (10 << 16) | (20 << 8) | 30 else (40 << 16) | (50 << 8) | 60)
    val img = Images.read(spark, dir.getPath)
    // identity resize: sum == byteSum, chk == sum of b*(pos+1) over BGR
    val ident = img.select(
        Images.resizeNearestSums(col("image"), 2, 1).as("r"),
        Images.byteSum(col("image.data")).as("bs"))
      .head()
    assert(ident.getStruct(0).getLong(0) === ident.getLong(1))
    // bytes BGR row-major: 30,20,10,60,50,40 -> chk = 30*1+20*2+10*3+60*4+50*5+40*6
    assert(ident.getStruct(0).getLong(1) ===
      (30 * 1 + 20 * 2 + 10 * 3 + 60 * 4 + 50 * 5 + 40 * 6).toLong)
    // downscale 2x1 -> 1x1: nearest = src x floor(0*2/1)=0 -> left pixel only
    val down = img.select(Images.resizeNearestSums(col("image"), 1, 1).as("r")).head()
    assert(down.getStruct(0).getLong(0) === (30 + 20 + 10).toLong)
    assert(down.getStruct(0).getLong(1) === (30 * 1 + 20 * 2 + 10 * 3).toLong)
  }

  test("channelStats: per-plane sums and maxima brute-checked against the " +
    "generator formulas (BGR inversion included)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("img_chan").toFile
    val ids = Seq(3L, 7L, 12L)
    Images.pngsFromDocIds(ids.toDF("doc_id"), "doc_id", dir.getPath)
    val got = Images.channelStats(Images.read(spark, dir.getPath))
      .select(regexp_extract(col("origin"), "doc_(\\d+)\\.png$", 1)
          .cast("long").as("id"),
        col("b_sum"), col("g_sum"), col("r_sum"),
        col("b_max"), col("g_max"), col("r_max"))
      .as[(Long, Long, Long, Long, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    ids.foreach { id =>
      val (w, h) = (Images.widthOf(id), Images.heightOf(id))
      // data channel c holds color component 2-c (BGR layout)
      def plane(c: Int) = for (y <- 0 until h; x <- 0 until w)
        yield Images.componentOf(id, x, y, 2 - c)
      val ps = (0 to 2).map(plane)
      val want = (ps(0).map(_.toLong).sum, ps(1).map(_.toLong).sum,
        ps(2).map(_.toLong).sum, ps(0).max, ps(1).max, ps(2).max)
      assert(got(id) === want, s"id=$id")
    }
  }

  test("kernels reject sub-3-channel frames with a clear error (BGR-plane " +
    "contract, mirroring Audio's format require)") {
    val dir = java.nio.file.Files.createTempDirectory("img_gray").toFile
    val g = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    javax.imageio.ImageIO.write(g, "png", new java.io.File(dir, "gray.png"))
    val imgs = Images.read(spark, dir.getPath)
    assert(imgs.select(col("image.nChannels")).head().getInt(0) === 1)
    def msg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("|")
    val e1 = intercept[Throwable] { Images.channelStats(imgs).collect() }
    assert(msg(e1).contains("nChannels >= 3"))
    val e2 = intercept[Throwable] { Images.resizeNearest(imgs, 1, 1).collect() }
    assert(msg(e2).contains("nChannels >= 3"))
  }

  test("dHash64: kernel == builtin device on every fixture image; hash " +
    "matches a scala replay of the 9x8 gradient law; gradient direction " +
    "is hash-visible") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("img_dhash").toFile
    val ids = Seq(3L, 7L, 12L, 18L, 25L, 33L)
    Images.pngsFromDocIds(ids.toDF("doc_id"), "doc_id", dir.getPath)
    val img = Images.read(spark, dir.getPath)
    val dev = img.select(col("image.origin").as("o"),
        Images.dHash64(col("image")).as("h"))
      .as[(String, Long)].collect().toMap
    val ker = Images.dHash64Kernel(img)
      .as[(String, Long)].collect().toMap
    assert(dev === ker, "builtin device and byte-array kernel must agree")
    // scala replay straight from the generator formulas
    ids.foreach { id =>
      val (w, h) = (Images.widthOf(id), Images.heightOf(id))
      def gray(x: Int, y: Int): Long = {
        val sx = x * w / 9; val sy = y * h / 8
        (0 until 3).map(c => Images.componentOf(id, sx, sy, c)).sum / 3L
      }
      var want = 0L
      for (i <- 0 until 64) {
        val x = i % 8; val y = i / 8
        if (gray(x, y) > gray(x + 1, y)) want |= (1L << i)
      }
      val key = dev.keys.find(_.endsWith(s"doc_$id.png")).get
      assert(dev(key) === want, s"id=$id")
    }
    // direction sensitivity: a left-to-right ramp and its mirror differ
    writePng(dir, "ramp.png", 9, 8)((x, _) => (x * 20) << 16)
    writePng(dir, "pmar.png", 9, 8)((x, _) => ((8 - x) * 20) << 16)
    val two = Images.dHash64Kernel(Images.read(spark, dir.getPath))
      .as[(String, Long)].collect().toMap
    val ramp = two(two.keys.find(_.endsWith("ramp.png")).get)
    val pmar = two(two.keys.find(_.endsWith("pmar.png")).get)
    assert(ramp !== pmar)
    assert(ramp === 0L,
      "ascending gray left-to-right must set no gradient bits")
    assert(pmar === -1L,
      "descending gray must set every gradient bit (incl. bit 63)")
  }

  test("pngsPlantedNearDup: decode + dHash64 reproduces Planted.sig " +
    "bit-exactly, planted pairs land at exactly kOf bits apart") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("img_planted").toFile
    val ids = (0L until 40L).toSeq
    graft.sources.Images.pngsPlantedNearDup(
      ids.toDF("doc_id"), "doc_id", dir.getPath)
    val got = Images.read(spark, dir.getPath)
      .select(regexp_extract(col("image.origin"), "doc_(\\d+)\\.png$", 1)
          .cast("long").as("id"),
        Images.dHash64(col("image")).as("h"))
      .as[(Long, Long)].collect().toMap
    ids.foreach(id => assert(got(id) === graft.sources.Planted.sig(id, 64),
      s"id=$id"))
    ids.filter(_ % 7 == 3).foreach { d =>
      assert(java.lang.Long.bitCount(got(d) ^ got(d - 3)) ===
        graft.sources.Planted.kOf(d), s"planted pair ($d, ${d - 3})")
    }
    // the binary-scan (streaming-capable) kernel agrees file-for-file
    val gotBin = Images.dHash64KernelBinary(
        spark.read.format("binaryFile").option("pathGlobFilter", "*.png")
          .load(dir.getPath))
      .select(regexp_extract(col("path"), "doc_(\\d+)\\.png$", 1)
          .cast("long").as("id"),
        col("dhash"))
      .as[(Long, Long)].collect().toMap
    assert(gotBin === got,
      "binaryFile-scan kernel must equal the mllib-frame device")
  }

  test("resizeNearest (production kernel) reproduces resizeNearestSums' " +
    "sum and checksum on every fixture image and scale") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("img_rszk").toFile
    Images.pngsFromDocIds(Seq(3L, 7L, 12L, 18L).toDF("doc_id"), "doc_id",
      dir.getPath)
    val img = Images.read(spark, dir.getPath)
    for ((dw, dh) <- Seq((2, 2), (5, 3), (1, 1), (7, 6))) {
      // the oracle-replay device: builtin hex walk
      val want = img.select(col("image.origin").as("o"),
          Images.resizeNearestSums(col("image"), dw, dh).as("r"))
        .select($"o", $"r.sum", $"r.chk")
        .as[(String, Long, Long)].collect()
        .map { case (o, s, c) => o -> ((s, c)) }.toMap
      // the production kernel: partition-local byte arrays
      val got = Images.resizeNearest(img, dw, dh)
        .select(col("image.origin"), col("image.height"), col("image.width"),
          col("image.nChannels"), col("image.data"))
        .as[(String, Int, Int, Int, Array[Byte])].collect()
      assert(got.length === 4)
      got.foreach { case (o, h, w, nc, data) =>
        assert((h, w, nc) === ((dh, dw, 3)))
        val sum = data.map(b => (b & 0xff).toLong).sum
        val chk = data.zipWithIndex
          .map { case (b, i) => (b & 0xff).toLong * (i + 1) }.sum
        assert((sum, chk) === want(o), s"mismatch at $o ${dw}x$dh")
      }
    }
  }
}
