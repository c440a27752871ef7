package graft

import graft.streaming.StreamingSample
import graft.streaming.StreamingSample.{Cand, PrioRow, ShardTopK}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** MemoryStream harness for the streaming priority sampler (gate qet):
  * the emitted candidate stream must contain the exact global top-k under
  * ANY batch split / arrival order, emission must be bounded (entries
  * only), and per-shard state must never exceed k rows. */
class StreamingSampleSpec extends SparkSpec {
  import spark.implicits._

  private def runTopK(batches: Seq[Seq[PrioRow]], k: Int): Seq[Cand] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[PrioRow]
    val cands = mem.toDS().groupByKey(_.shard)
      .transformWithState(new ShardTopK(k), TimeMode.None(), OutputMode.Append())
    val name = s"topk_sink_${System.nanoTime()}"
    val q = cands.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[Cand].collect().toSeq
  }

  // deterministic pseudo-random priorities over 2 shards
  private def fixture(n: Int): Seq[PrioRow] = (1 to n).map { i =>
    val pr = ((i * 2654435761L) % 1000003L).toDouble / 7.0
    PrioRow(i % 2, i.toLong, i.toLong, pr)
  }

  private def bruteTopK(rows: Seq[PrioRow], k: Int): Seq[(Long, Double)] =
    rows.sortBy(r => (-r.priority, r.docId)).take(k).map(r => (r.docId, r.priority))

  test("final TakeOrdered over the candidate stream equals the global top-k") {
    val rows = fixture(500)
    val cands = runTopK(Seq(rows), k = 25)
    val got = cands.sortBy(c => (-c.priority, c.docId)).take(25)
      .map(c => (c.docId, c.priority))
    assert(got === bruteTopK(rows, 25))
  }

  test("arrival order and batch splits never change the final top-k; " +
    "emission is entries-only (bounded)") {
    val rows = fixture(400)
    val byId = runTopK(rows.grouped(57).toSeq, k = 10)
    val desc = runTopK(rows.sortBy(r => -r.priority).grouped(91).toSeq, k = 10)
    def fin(cs: Seq[Cand]) =
      cs.sortBy(c => (-c.priority, c.docId)).take(10).map(c => (c.docId, c.priority))
    assert(fin(byId) === fin(desc))
    assert(fin(byId) === bruteTopK(rows, 10))
    // descending-priority arrival is the best case: exactly the first k
    // per shard enter, nothing after can
    assert(desc.length === 2 * 10,
      s"descending arrival must emit exactly k per shard, got ${desc.length}")
    // random-id arrival emits every running-top-k entry but still far
    // fewer than n (O(k log n) expected per shard)
    assert(byId.length < rows.length / 2)
  }

  test("a shard with fewer rows than k emits all of them") {
    val rows = Seq(PrioRow(7L, 1L, 5L, 2.0), PrioRow(7L, 2L, 5L, 1.0))
    val cands = runTopK(Seq(rows), k = 100)
    assert(cands.map(_.docId).sorted === Seq(1L, 2L))
  }

  // ---- BudgetGate ---------------------------------------------------------

  import graft.streaming.StreamingSample.{BudgetRow, BudgetGate, KeptDoc}
  import org.apache.spark.sql.functions._

  private def runBudget(batches: Seq[Seq[BudgetRow]],
                        shardBudget: Long): Seq[KeptDoc] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[BudgetRow]
    val ds = mem.toDS()
      .withColumn("ts", timestamp_micros(col("docId") * 1000000L))
      .withWatermark("ts", "0 seconds")
      .drop("ts").as[BudgetRow]
    val kept = graft.streaming.EventTimeOps.ordered(ds,
      (r: BudgetRow) => r.shard, new BudgetGate(shardBudget))
    val name = s"budget_sink_${System.nanoTime()}"
    val q = kept.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      mem.addData(); q.processAllAvailable() // final watermark nudge
    } finally q.stop()
    spark.table(name).as[KeptDoc].collect().toSeq
  }

  test("BudgetGate: per-shard contiguous prefix in doc order, counter " +
    "counts rejected docs too, batch-split invariant") {
    // shard 1: 40+70 admitted (110<=120), 30 rejected (140>120), then 5
    // must ALSO be rejected (counter kept counting: cum=145)
    val rows = Seq(
      BudgetRow(1L, 10L, 40L), BudgetRow(1L, 20L, 70L),
      BudgetRow(1L, 30L, 30L), BudgetRow(1L, 40L, 5L),
      BudgetRow(2L, 11L, 120L), BudgetRow(2L, 21L, 1L))
    val expect = Seq(KeptDoc(10L, 1L, 40L, 0L), KeptDoc(20L, 1L, 70L, 40L),
      KeptDoc(11L, 2L, 120L, 0L))
    val whole = runBudget(Seq(rows), 120L)
    assert(whole.sortBy(_.docId) === expect.sortBy(_.docId))
    // batch splits with shuffled WITHIN-batch order: the ordered drain
    // must restore per-shard doc order before gating (cross-batch order
    // stays ascending — the watermark contract all file replays satisfy)
    val split = runBudget(Seq(Seq(rows(4), rows(0)), Seq(rows(5), rows(1)),
      Seq(rows(2), rows(3))), 120L)
    assert(split.sortBy(_.docId) === expect.sortBy(_.docId))
  }

  test("BudgetGate: differential fuzz vs the batch per-shard prefix rule " +
    "on random corpora and random batch splits") {
    val rnd = new scala.util.Random(7)
    (1 to 2).foreach { trial =>
      val rows = (1 to 120).map { i =>
        BudgetRow((i % (2 + rnd.nextInt(3))).toLong, i.toLong,
          1L + rnd.nextInt(30))
      }
      val budget = 60L + rnd.nextInt(120)
      // brute: per shard in docId order, cum counts everything
      val brute = rows.groupBy(_.shard).toSeq.flatMap { case (sh, rs) =>
        var cum = 0L
        rs.sortBy(_.docId).flatMap { r =>
          val keep = cum + r.nToks <= budget
          val row = if (keep) Some(KeptDoc(r.docId, sh, r.nToks, cum)) else None
          cum += r.nToks
          row
        }
      }.sortBy(_.docId)
      // random split into ascending-docId batches (watermark-safe)
      val cuts = (Seq(0, 120) ++ Seq.fill(3)(rnd.nextInt(121))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => rows.slice(a, b) }
      val got = runBudget(batches, budget).sortBy(_.docId)
      assert(got === brute, s"trial $trial budget=$budget")
    }
  }

  // ---- streaming mixture top-up --------------------------------------------

  private def topupDocs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "lang")

  test("StreamingTopup fuzz: random corpora and random delivery splits " +
    "equal sequential batch top-ups with hand-accumulated composition") {
    import graft.operators.Sampling
    val rnd = new scala.util.Random(62003)
    for (trial <- 0 until 2) {
      val rows = (0 until 60 + rnd.nextInt(60)).map(i =>
        i.toLong -> s"l${i % (2 + rnd.nextInt(4))}")
      val c1 = 10 + rnd.nextInt(20); val c2 = c1 + 10 + rnd.nextInt(20)
      val slices = Seq(rows.take(c1), rows.slice(c1, c2), rows.drop(c2))
      val target = 5L + rnd.nextInt(20); val budget = 8L + rnd.nextInt(30)
      val base = java.nio.file.Files.createTempDirectory(s"topup_fuzz$trial").toFile
      val src = new java.io.File(base, "src"); src.mkdirs()
      slices.zipWithIndex.foreach { case (sl, i) =>
        topupDocs(sl).coalesce(1).write.parquet(s"$src/slice$i")
        Thread.sleep(20)
      }
      val q = graft.streaming.StreamingTopup.startTopupIngest(
        spark.readStream.schema(topupDocs(rows).schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$src/slice*"),
        "doc_id", "lang", target, budget,
        new java.io.File(base, "state").getAbsolutePath,
        new java.io.File(base, "out").getAbsolutePath,
        new java.io.File(base, "ckpt").getAbsolutePath)
      try q.processAllAvailable() finally q.stop()
      val got = spark.read.parquet(s"$base/out/admitted")
        .select("doc_id", "lang", "rk", "batch_id")
        .as[(Long, String, Long, Long)].collect().toSet
      var cur = Map.empty[String, Long]
      val expected = slices.zipWithIndex.flatMap { case (sl, i) =>
        val a = Sampling.topupAdmit(topupDocs(sl), "doc_id", "lang",
            cur.toSeq.toDF("lang", "n"), target, budget)
          .as[(Long, String, Long)].collect()
        a.groupBy(_._2).foreach { case (l, rs) =>
          cur = cur.updated(l, cur.getOrElse(l, 0L) + rs.length) }
        a.map(r => (r._1, r._2, r._3, i.toLong))
      }.toSet
      assert(got === expected,
        s"trial $trial target=$target budget=$budget split=$c1/$c2")
      org.apache.commons.io.FileUtils.deleteQuietly(base)
    }
  }

  test("StreamingTopup: two deliveries equal sequential batch top-ups " +
    "with accumulated composition; restart is a ledgered no-op; a " +
    "half-written state delta from a crashed attempt is ignored") {
    import graft.operators.Sampling
    val d1 = (0L until 30L).map(i => i -> s"l${i % 3}")
    val d2 = (100L until 160L).map(i => i -> s"l${i % 5}")
    val base = java.nio.file.Files.createTempDirectory("topup_stream").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    topupDocs(d1).coalesce(1).write.parquet(s"$src/slice0")
    Thread.sleep(20)
    topupDocs(d2).coalesce(1).write.parquet(s"$src/slice1")
    val stateDir = new java.io.File(base, "state").getAbsolutePath
    val outDir = new java.io.File(base, "out").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    // plant a CRASHED first attempt of batch 1: a bogus state delta that
    // a correct replay must never read (it would see its own partition)
    topupDocs(Seq(0L -> "l0")).groupBy("lang").count()
      .withColumnRenamed("count", "n")
      .write.mode("overwrite").parquet(s"$stateDir/delta/batch_id=1")
    val schema = topupDocs(d1).schema
    def start() = graft.streaming.StreamingTopup.startTopupIngest(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$src/slice*"),
      "doc_id", "lang", targetPerGroup = 12L, totalBudget = 25L,
      stateDir, outDir, ckpt)
    val q = start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$outDir/admitted")
      .select("doc_id", "lang", "rk", "batch_id")
      .as[(Long, String, Long, Long)].collect()
    // twin: sequential batch top-ups, composition accumulated by hand
    val empty = Seq.empty[(String, Long)].toDF("lang", "n")
    val a1 = Sampling.topupAdmit(topupDocs(d1), "doc_id", "lang", empty,
      targetPerGroup = 12L, totalBudget = 25L)
      .as[(Long, String, Long)].collect()
    val cur1 = a1.groupBy(_._2).map { case (l, rs) => l -> rs.length.toLong }
    val a2 = Sampling.topupAdmit(topupDocs(d2), "doc_id", "lang",
      cur1.toSeq.toDF("lang", "n"),
      targetPerGroup = 12L, totalBudget = 25L)
      .as[(Long, String, Long)].collect()
    val expected = a1.map(r => (r._1, r._2, r._3, 0L)).toSet ++
      a2.map(r => (r._1, r._2, r._3, 1L)).toSet
    assert(got.toSet === expected)
    // the planted bogus delta for batch 1 was overwritten by the real one
    val delta1 = spark.read.parquet(s"$stateDir/delta")
      .filter(col("batch_id") === 1)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(delta1 === a2.groupBy(_._2).map { case (l, rs) => l -> rs.length.toLong })
    // restart over the same source + checkpoint: no new work, no drift
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$outDir/admitted")
      .select("doc_id", "lang", "rk", "batch_id")
      .as[(Long, String, Long, Long)].collect().toSet === expected)
    org.apache.commons.io.FileUtils.deleteQuietly(base)
  }
}
