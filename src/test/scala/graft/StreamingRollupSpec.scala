package graft

import graft.streaming.DeltaState
import org.apache.spark.sql.functions._

/** Delta-dir roll-up (streaming/DeltaState.scala): rolled streams emit
  * byte-identical outputs to unrolled ones, the state read stays O(1)
  * in stream age, and a crash planted anywhere inside the fold window
  * (before the generation commit / after it, before the deletes)
  * neither loses nor double-counts state. */
class StreamingRollupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "lang")

  test("stride stream, rollEvery=2 over 6 deliveries: outputs and final " +
    "per-group state byte-identical to the unrolled stream; the state " +
    "dir ends with one generation and fewer live deltas than batches") {
    val slices = (0 until 6).map { s =>
      ((s * 100).toLong until (s * 100 + 12 + s).toLong).map(i => i -> s"l${i % 3}")
    }
    val weights = Map("l0" -> 3L, "l1" -> 2L, "l2" -> 1L)
    def run(rollEvery: Int): (Set[(Long, String, Long, Long)], Map[String, Long], String) = {
      val base = java.nio.file.Files.createTempDirectory(s"roll$rollEvery").toFile
      val src = new java.io.File(base, "src"); src.mkdirs()
      slices.zipWithIndex.foreach { case (rows, s) =>
        docs(rows).coalesce(1).write.parquet(s"$src/slice$s")
        Thread.sleep(20)
      }
      val stateDir = new java.io.File(base, "state").getAbsolutePath
      def start() = graft.streaming.StreamingCurriculum.startStrideIngest(
        spark.readStream.schema(docs(slices.head).schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$src/slice*"),
        "doc_id", "lang", weights, stateDir,
        new java.io.File(base, "out").getAbsolutePath,
        new java.io.File(base, "ckpt").getAbsolutePath,
        rollEvery = rollEvery)
      val q = start()
      try q.processAllAvailable() finally q.stop()
      // restart over the same checkpoint: a ledgered no-op even with
      // rolled state (the replayed reads see generation + live deltas)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val out = spark.read.parquet(s"$base/out/ordered")
        .select("doc_id", "lang", "rk", "vt")
        .as[(Long, String, Long, Long)].collect().toSet
      val state = DeltaState.read(spark, stateDir, excludeBid = -999L,
          Seq("lang", "n")).get
        .groupBy("lang").agg(sum("n").as("n"))
        .as[(String, Long)].collect().toMap
      (out, state, stateDir)
    }
    val (rolled, rolledState, rolledDir) = run(rollEvery = 2)
    val (plain, plainState, _) = run(rollEvery = 1000) // never folds
    assert(rolled === plain, "rolled stream must emit identical rows")
    assert(rolledState === plainState, "rolled state sums must be identical")
    // the rolled run actually folded: one complete generation, and the
    // live delta count is bounded by rollEvery, not by 6 batches
    val roll = new java.io.File(s"$rolledDir/rollup")
    val gens = roll.listFiles().filter(_.isDirectory).map(_.getName).toSeq
    assert(gens.length === 1 && gens.head.startsWith("w="), s"gens: $gens")
    val lives = new java.io.File(s"$rolledDir/delta").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(lives.length < 2, s"live deltas not folded: $lives")
  }

  test("topup stream, rollEvery=2: admissions identical to the unrolled " +
    "stream across 5 deliveries") {
    val slices = (0 until 5).map { s =>
      ((s * 100).toLong until (s * 100 + 10).toLong).map(i => i -> s"g${i % 2}")
    }
    def run(rollEvery: Int) = {
      val base = java.nio.file.Files.createTempDirectory(s"topup$rollEvery").toFile
      val src = new java.io.File(base, "src"); src.mkdirs()
      slices.zipWithIndex.foreach { case (rows, s) =>
        docs(rows).coalesce(1).write.parquet(s"$src/slice$s")
        Thread.sleep(20)
      }
      val q = graft.streaming.StreamingTopup.startTopupIngest(
        spark.readStream.schema(docs(slices.head).schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$src/slice*"),
        "doc_id", "lang", targetPerGroup = 18L, totalBudget = 7L,
        new java.io.File(base, "state").getAbsolutePath,
        new java.io.File(base, "out").getAbsolutePath,
        new java.io.File(base, "ckpt").getAbsolutePath,
        rollEvery = rollEvery)
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(s"$base/out/admitted")
        .select("doc_id", "lang", "rk")
        .as[(Long, String, Long)].collect().toSet
    }
    assert(run(rollEvery = 2) === run(rollEvery = 1000))
  }

  test("doremi stream: the LAST delivery's published weights equal the " +
    "batch operator over the union, rolled == unrolled, restart is a " +
    "ledgered no-op") {
    val slices = (0 until 5).map { s =>
      ((s * 50).toLong until (s * 50 + 20).toLong).map { i =>
        (i, s"d${i % 3}", (i * 37) % 997, i % 4)
      }
    }
    def rows(sl: Seq[(Long, String, Long, Long)]) =
      sl.toDF("id", "dom", "excess", "step")
    def run(rollEvery: Int): Seq[(String, Long, Long)] = {
      val base = java.nio.file.Files.createTempDirectory(s"doremi$rollEvery").toFile
      val src = new java.io.File(base, "src"); src.mkdirs()
      slices.zipWithIndex.foreach { case (sl, s) =>
        rows(sl).coalesce(1).write.parquet(s"$src/slice$s")
        Thread.sleep(20)
      }
      def start() = graft.streaming.StreamingMixture.startDoremiIngest(
        spark.readStream.schema(rows(slices.head).schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$src/slice*"),
        "dom", "excess", "step", steps = 4, etaMilli = 500,
        smoothMilli = 100,
        new java.io.File(base, "state").getAbsolutePath,
        new java.io.File(base, "out").getAbsolutePath,
        new java.io.File(base, "ckpt").getAbsolutePath,
        rollEvery = rollEvery)
      val q = start(); try q.processAllAvailable() finally q.stop()
      // restart over the same checkpoint: ledgered no-op
      val q2 = start(); try q2.processAllAvailable() finally q2.stop()
      val w = new java.io.File(base, "out/weights")
      val last = w.listFiles().filter(_.isDirectory).map(_.getName)
        .map(_.stripPrefix("batch_id=").toLong).max
      assert(last === 4L, s"expected 5 deliveries, newest was $last")
      spark.read.parquet(s"$w/batch_id=$last")
        .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    }
    val batch = graft.operators.Sampling.doremiWeightsScaled(
        rows(slices.flatten), "dom", "excess", "step", steps = 4,
        etaMilli = 500, smoothMilli = 100)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(run(rollEvery = 2) === batch,
      "rolled stream's final estimate must equal the batch mixture")
    assert(run(rollEvery = 1000) === batch,
      "unrolled stream's final estimate must equal the batch mixture")
  }

  test("doremi stream: a zero-row batch 0 is ledgered and skipped (no " +
    "domains yet, nothing published), and the first real delivery " +
    "publishes the batch answer") {
    val base = java.nio.file.Files.createTempDirectory("doremiempty").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    val data = (0L until 20L).map(i => (i, s"d${i % 3}", (i * 37) % 997, i % 4))
    val schema = data.toDF("id", "dom", "excess", "step").schema
    // slice 0 is EMPTY: the regression the guard exists for — an empty
    // first delivery must not crash the query on requires(domains.nonEmpty)
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema).coalesce(1).write.parquet(s"$src/slice0")
    Thread.sleep(20)
    data.toDF("id", "dom", "excess", "step").coalesce(1)
      .write.parquet(s"$src/slice1")
    val q = graft.streaming.StreamingMixture.startDoremiIngest(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/slice*"),
      "dom", "excess", "step", steps = 4, etaMilli = 500, smoothMilli = 100,
      new java.io.File(base, "state").getAbsolutePath,
      new java.io.File(base, "out").getAbsolutePath,
      new java.io.File(base, "ckpt").getAbsolutePath)
    try q.processAllAvailable() finally q.stop()
    val w = new java.io.File(base, "out/weights")
    val published = w.listFiles().filter(_.isDirectory).map(_.getName)
      .map(_.stripPrefix("batch_id=").toLong).sorted.toSeq
    assert(!published.contains(0L),
      s"the empty delivery must publish nothing, got $published")
    assert(published.nonEmpty, "the real delivery must publish")
    val got = spark.read.parquet(s"$w/batch_id=${published.max}")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    val want = graft.operators.Sampling.doremiWeightsScaled(
        data.toDF("id", "dom", "excess", "step"), "dom", "excess", "step",
        steps = 4, etaMilli = 500, smoothMilli = 100)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === want)
  }

  test("planted mid-fold crashes: an UNCOMMITTED generation is invisible " +
    "and cleaned; a committed generation with its folded deltas still on " +
    "disk never double-counts, and cleanup sweeps the leftovers") {
    val base = java.nio.file.Files.createTempDirectory("rollcrash").toFile
    val stateDir = new java.io.File(base, "state").getAbsolutePath
    def writeDelta(bid: Long, rows: (String, Long)*): Unit =
      rows.toSeq.toDF("g", "n").write.mode("overwrite")
        .parquet(s"$stateDir/delta/batch_id=$bid")
    def readSums(excludeBid: Long): Map[String, Long] =
      DeltaState.read(spark, stateDir, excludeBid, Seq("g", "n"))
        .map(_.groupBy("g").agg(sum("n").as("n"))
          .as[(String, Long)].collect().toMap)
        .getOrElse(Map.empty)
    writeDelta(0, ("a", 1L), ("b", 2L))
    writeDelta(1, ("a", 10L))
    writeDelta(2, ("b", 20L))
    val truth = Map("a" -> 11L, "b" -> 22L)
    assert(readSums(3) === truth)
    // CRASH A: fold died before the _SUCCESS commit — plant an
    // incomplete generation claiming w=2; readers must ignore it
    Seq(("a", 999L)).toDF("g", "n").write.parquet(s"$stateDir/rollup/w=2")
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/rollup/w=2/_SUCCESS"), false)
    assert(readSums(3) === truth, "uncommitted generation must be invisible")
    // the retry (next batch's maybeRollup) sweeps it and refolds
    DeltaState.maybeRollup(spark, stateDir, "g", "n", rollEvery = 2)
    assert(readSums(3) === truth, "refolded state must be unchanged")
    val gens = new java.io.File(s"$stateDir/rollup").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(gens === Seq("w=2"), s"expected one committed generation, got $gens")
    assert(new java.io.File(s"$stateDir/rollup/w=2/_SUCCESS").exists())
    // CRASH B: fold committed generation w=4 but died BEFORE deleting
    // the folded deltas — the watermark excludes them, so no double count
    writeDelta(3, ("a", 100L))
    writeDelta(4, ("b", 200L))
    val truth2 = Map("a" -> 111L, "b" -> 222L)
    Seq(("a", 111L), ("b", 222L)).toDF("g", "n")
      .write.parquet(s"$stateDir/rollup/w=4") // committed (has _SUCCESS)
    assert(readSums(5) === truth2,
      "leftover folded deltas must be masked by the watermark")
    // cleanup preamble of the next fold sweeps the leftovers + old gen
    DeltaState.maybeRollup(spark, stateDir, "g", "n", rollEvery = 1000)
    assert(readSums(5) === truth2)
    val deltasLeft = Option(new java.io.File(s"$stateDir/delta").listFiles())
      .map(_.filter(_.isDirectory).map(_.getName).toSeq).getOrElse(Seq.empty)
    assert(deltasLeft.isEmpty, s"folded deltas must be swept, got $deltasLeft")
    val gens2 = new java.io.File(s"$stateDir/rollup").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(gens2 === Seq("w=4"), s"superseded generation must be swept: $gens2")
    // a delta BEYOND the watermark composes with the generation
    writeDelta(7, ("a", 1000L))
    assert(readSums(8) === Map("a" -> 1111L, "b" -> 222L))
    // and the reader's self-exclusion still applies to live deltas
    assert(readSums(7) === truth2)
    org.apache.commons.io.FileUtils.deleteQuietly(base)
  }

  test("IngestLedger: sequential marks fold to a watermark generation " +
    "(O(1) listing in stream age), done-ness exact across planted " +
    "mid-roll crashes") {
    import graft.streaming.IngestLedger
    val base = java.nio.file.Files.createTempDirectory("ingestledger").toFile
    val dir = new java.io.File(base, "_ledger").getAbsolutePath
    (0L to 20L).foreach { bid =>
      assert(!IngestLedger.isDone(spark, dir, bid), s"bid $bid already done?")
      IngestLedger.markDone(spark, dir, bid, rollEvery = 4)
      assert(IngestLedger.isDone(spark, dir, bid), s"bid $bid not done")
    }
    // every past id answers done (watermark or live delta), the next
    // unseen id does not
    (0L to 20L).foreach(b => assert(IngestLedger.isDone(spark, dir, b), s"b=$b"))
    assert(!IngestLedger.isDone(spark, dir, 21L))
    // the fold actually capped the dir: live deltas bounded by rollEvery,
    // ONE complete generation — 21 batches did not leave 21 files
    val deltas = new java.io.File(s"$dir/delta").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(deltas.length <= 5, s"unfolded deltas: $deltas")
    val gens = new java.io.File(s"$dir/rollup").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(gens.length === 1 && gens.head.startsWith("w="), s"gens: $gens")
    // CRASH A: roll died before _SUCCESS — an incomplete generation
    // claiming a higher watermark must not fake done-ness, and the next
    // mark sweeps it
    new java.io.File(s"$dir/rollup/w=40").mkdirs()
    assert(!IngestLedger.isDone(spark, dir, 25L),
      "incomplete generation must not answer done")
    assert(IngestLedger.isDone(spark, dir, 20L))
    IngestLedger.markDone(spark, dir, 21L, rollEvery = 4)
    assert(!new java.io.File(s"$dir/rollup/w=40").exists(),
      "incomplete generation must be swept")
    assert(IngestLedger.isDone(spark, dir, 21L))
    // CRASH B: generation committed but a folded delta survived the
    // deletes — covered by the watermark, swept by the next mark
    spark.range(1).selectExpr("CAST(2 AS BIGINT) AS batch_id")
      .write.mode("overwrite").parquet(s"$dir/delta/batch_id=2")
    assert(IngestLedger.isDone(spark, dir, 2L))
    IngestLedger.markDone(spark, dir, 22L, rollEvery = 4)
    assert(IngestLedger.isDone(spark, dir, 2L) &&
      IngestLedger.isDone(spark, dir, 22L))
    val lateDeltas = new java.io.File(s"$dir/delta").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(!lateDeltas.contains("batch_id=2"), s"leftover not swept: $lateDeltas")
    org.apache.commons.io.FileUtils.deleteQuietly(base)
  }
}
