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
}
