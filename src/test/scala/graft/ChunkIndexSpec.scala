package graft

import graft.operators.{ChunkIndex, Dedup}
import org.apache.spark.sql.functions._

/** Persistent CDC chunk-claim index (operators/ChunkIndex.scala): the
  * ingest-on-empty == batch-operator unification, the causal
  * cross-delivery claim rule (shifted duplicates included),
  * zero-corpus-exchange probing, replay idempotence under the delivery
  * id, compact equivalence, the write lease, and the ledgered stream
  * unit. */
class ChunkIndexSpec extends SparkSpec {
  import spark.implicits._

  private val ref = ChunkIndex.Ref("cspec", buckets = 4)
  // small divisor => boundaries every ~4 chars: multi-chunk docs even on
  // short fixtures (the gate runs the qfy parameters at corpus scale)
  private val (w, dv, rm) = (8, 4L, 1L)

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private def ing(rows: Seq[(Long, String)], delivery: String = null) =
    if (delivery == null)
      ChunkIndex.ingest(docs(rows: _*), "doc_id", "text", w, dv, rm, ref)
    else
      ChunkIndex.ingest(docs(rows: _*), "doc_id", "text", w, dv, rm, ref,
        delivery)
  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  private val passage = "the quick brown fox jumps over the lazy dog again"
  private val batch0 = Seq[(Long, String)](
    1L -> s"alpha opening. $passage and alpha closing.",
    2L -> "beta body with entirely singular wording throughout")
  private val batch1 = Seq[(Long, String)](
    11L -> s"gamma prefix shifts the offset: $passage gamma tail.", // SHIFTED copy
    12L -> "delta another unique body of words")
  private val batch2 = Seq[(Long, String)](
    21L -> batch0.head._2, // verbatim copy of doc 1
    22L -> "epsilon fresh content nothing shared")

  test("ingest on an empty index IS the batch operator: one-delivery " +
    "ingest equals dedupCdcKeepFirst row for row") {
    ChunkIndex.drop(spark, ref)
    val corpus = batch0 ++ batch1 ++ batch2
    val got = collect(ing(corpus))
    val batch = collect(Dedup.dedupCdcKeepFirst(docs(corpus: _*),
      "doc_id", "text", w, dv, rm))
    assert(got === batch)
    ChunkIndex.drop(spark, ref)
  }

  test("causal claim rule: the earlier delivery keeps its chunks, later " +
    "arrivals lose theirs — at a SHIFTED offset too; three range " +
    "deliveries compose to the batch operator's global keep-first") {
    ChunkIndex.drop(spark, ref)
    val outs = Seq(batch0, batch1, batch2).map(b => collect(ing(b)))
    // delivery 0: nothing claimed yet — all chunks kept
    assert(outs(0)(1L)._1 === outs(0)(1L)._2)
    // delivery 1: the shifted passage's resynced chunks are claimed by
    // delivery 0 — doc 11 loses content but keeps its own prose
    val (n11, k11, t11) = outs(1)(11L)
    assert(k11 < n11, "shifted duplicate must lose chunks to delivery 0")
    assert(t11.contains("gamma"))
    // delivery 2: the verbatim copy of doc 1 keeps nothing (dropped row)
    assert(!outs(2).contains(21L), "fully-claimed doc must drop")
    assert(outs(2)(22L)._1 === outs(2)(22L)._2)
    // the union of causal range-delivery outputs == the global batch rule
    // (the qg0 gate's argument, pinned here at fixture scale)
    val corpus = batch0 ++ batch1 ++ batch2
    val batchOp = collect(Dedup.dedupCdcKeepFirst(docs(corpus: _*),
      "doc_id", "text", w, dv, rm))
    assert(outs.reduce(_ ++ _) === batchOp)
    ChunkIndex.drop(spark, ref)
  }

  test("dedupAgainst is the read-only rule: same result an ingest would " +
    "produce, and the index does not grow") {
    ChunkIndex.drop(spark, ref)
    ing(batch0).count()
    val rows = spark.table(ref.chunksTable).count()
    val ro = collect(ChunkIndex.dedupAgainst(docs(batch1: _*), "doc_id",
      "text", w, dv, rm, ref))
    assert(spark.table(ref.chunksTable).count() === rows, "read-only must not append")
    val rw = collect(ing(batch1))
    assert(ro === rw)
    assert(spark.table(ref.chunksTable).count() > rows)
    ChunkIndex.drop(spark, ref)
  }

  test("replay idempotence: a retried ingest under the SAME delivery id " +
    "is byte-identical even after the first attempt's append landed, and " +
    "compact cancels the duplicate rows exactly") {
    ChunkIndex.drop(spark, ref)
    ing(batch0, "d0").count()
    val first = collect(ing(batch1, "d1"))
    val rowsAfter = spark.table(ref.chunksTable).count()
    // crashed retry: the append landed, the output did not — re-run
    val retried = collect(ing(batch1, "d1"))
    assert(retried === first, "replay must be byte-identical")
    assert(spark.table(ref.chunksTable).count() > rowsAfter,
      "the replay's residue is duplicate delivery rows")
    // a FRESH id for replayed content would over-suppress — the recovery
    // is retraction while lineage is intact (BEFORE any compact)
    ChunkIndex.recoverDelivery(spark, ref, "d1")
    val fresh = collect(ing(batch1, "d1b"))
    assert(fresh === first,
      "after retraction, re-ingest under a fresh id sees only d0's claims")
    // compact cancels replay duplicates exactly: replay d1b once more,
    // then merge — one row per distinct chunk survives
    ing(batch1, "d1b").count()
    val distinct = spark.table(ref.chunksTable)
      .select("h", "h2").distinct().count()
    assert(spark.table(ref.chunksTable).count() > distinct)
    ChunkIndex.compact(spark, ref)
    assert(spark.table(ref.chunksTable).count() === distinct,
      "compact must cancel replay duplicates to one row per chunk")
    ChunkIndex.drop(spark, ref)
  }

  test("compact: one file per bucket, one row per distinct chunk, " +
    "dedup results unchanged") {
    ChunkIndex.drop(spark, ref)
    Seq(batch0, batch1).foreach(b => ing(b).count())
    def files() = new java.io.File(spark.conf
      .get("spark.sql.warehouse.dir").stripPrefix("file:"), ref.chunksTable)
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = collect(ChunkIndex.dedupAgainst(docs(batch2: _*), "doc_id",
      "text", w, dv, rm, ref))
    val distinct = spark.table(ref.chunksTable).select("h", "h2").distinct().count()
    val totalCnt = spark.table(ref.chunksTable).agg(sum(col("cnt"))).head().getLong(0)
    assert(files() > ref.buckets, "expected multi-file table before compact")
    ChunkIndex.compact(spark, ref)
    assert(files() <= ref.buckets, s"not compacted: ${files()} files")
    assert(spark.table(ref.chunksTable).count() === distinct)
    assert(spark.table(ref.chunksTable).agg(sum(col("cnt"))).head().getLong(0)
      === totalCnt, "compaction must preserve total occurrence counts")
    assert(collect(ChunkIndex.dedupAgainst(docs(batch2: _*), "doc_id",
      "text", w, dv, rm, ref)) === before)
    ChunkIndex.drop(spark, ref)
  }

  test("the corpus probe joins bucket-aligned on h with h2 confirmed " +
    "post-join: the corpus side never sits under an Exchange") {
    ChunkIndex.drop(spark, ref)
    Seq(batch0, batch1).foreach(b => ing(b).count())
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = docs(31L -> batch0.head._2)
      val chunks = graft.operators.TextPipeline
        .cdcChunks(probe, "doc_id", "text", w, dv, rm)
        .select(graft.functions.Fnv1a64Expr(col("chunk_text")).as("h"),
          xxhash64(col("chunk_text")).as("h2")).distinct()
      // the OPERATOR-exact probe, confirm filter included: a bare
      // `_ih2 === h2` filter gets lifted into the join condition, the
      // join keys become (h, h2), and the planner disables the bucketing
      // and shuffles the corpus — the subtraction form stays a post-join
      // filter (this pin caught exactly that regression)
      val j = spark.table(ref.chunksTable)
        .select(col("h"), col("h2").as("_ih2"))
        .join(chunks, Seq("h")).filter(col("_ih2") - col("h2") === 0L)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan should be bucketed:\n$plan")
      assert(!plan.matches("(?s).*Exchange[^\n]*\n[^\n]*FileScan parquet[^\n]*graft_chunkidx.*"),
        s"the corpus side must not sit under an Exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    ChunkIndex.drop(spark, ref)
  }

  test("write lease: a second writer fails fast with the holder's name; " +
    "breakLease restores write access") {
    ChunkIndex.drop(spark, ref)
    ing(batch0).count()
    val lease = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), s"graft_chunkidx_lease_${ref.tag}")
    java.nio.file.Files.write(lease.toPath,
      "crashed-ingest".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e1 = intercept[IllegalStateException] { ing(batch1) }
    assert(e1.getMessage.contains("crashed-ingest"))
    val e2 = intercept[IllegalStateException] { ChunkIndex.compact(spark, ref) }
    assert(e2.getMessage.contains("crashed-ingest"))
    ChunkIndex.breakLease(spark, ref)
    ing(batch1).count()
    assert(!lease.exists(), "lease must release when the writer completes")
    ChunkIndex.drop(spark, ref)
  }

  test("ledgered stream unit: an already-ledgered batch is skipped whole; " +
    "an unledgered replay (planted crash) re-runs byte-identically") {
    ChunkIndex.drop(spark, ref)
    val base = java.nio.file.Files.createTempDirectory("chunkidxstream").toFile
    val outDir = new java.io.File(base, "out").getAbsolutePath
    ChunkIndex.ingestBatchOnce(docs(batch0: _*), "doc_id", "text", w, dv, rm,
      ref, outDir, bid = 0L)
    ChunkIndex.ingestBatchOnce(docs(batch1: _*), "doc_id", "text", w, dv, rm,
      ref, outDir, bid = 1L)
    val out1 = spark.read.parquet(s"$outDir/dedup/batch_id=1")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val idxRows = spark.table(ref.chunksTable).count()
    // ledgered replay: skipped whole (no append, no rewrite)
    ChunkIndex.ingestBatchOnce(docs(batch1: _*), "doc_id", "text", w, dv, rm,
      ref, outDir, bid = 1L)
    assert(spark.table(ref.chunksTable).count() === idxRows)
    // planted crash: the ledger mark is lost but the append survived —
    // the re-run self-excludes and rewrites identical output
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$outDir/_ledger"), true)
    ChunkIndex.ingestBatchOnce(docs(batch1: _*), "doc_id", "text", w, dv, rm,
      ref, outDir, bid = 1L)
    val replayed = spark.read.parquet(s"$outDir/dedup/batch_id=1")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(replayed === out1, "unledgered replay must rewrite identical rows")
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    ChunkIndex.drop(spark, ref)
  }

  test("ledger rollup torn mid-fold under an INDEX caller: a generation " +
    "missing _SUCCESS is invisible and swept, done batches never " +
    "re-ingest, undone ones still do") {
    ChunkIndex.drop(spark, ref)
    val base = java.nio.file.Files.createTempDirectory("chunkidxroll").toFile
    val outDir = new java.io.File(base, "out").getAbsolutePath
    val ledger = s"$outDir/_ledger"
    val batches = Seq(batch0, batch1, batch2)
    batches.zipWithIndex.foreach { case (b, i) =>
      ChunkIndex.ingestBatchOnce(docs(b: _*), "doc_id", "text", w, dv, rm,
        ref, outDir, bid = i.toLong)
    }
    val idxRows = spark.table(ref.chunksTable).count()
    // planted crash: a rollup write died between landing its parquet and
    // its _SUCCESS — exactly the window markDone's fold leaves open
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.range(1).select(lit(2L).as("w")).write.mode("overwrite")
      .parquet(s"$ledger/rollup/w=2")
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$ledger/rollup/w=2/_SUCCESS"), false))
    // NO REPLAY: every completed batch still reads done from the deltas
    (0L to 2L).foreach { bid =>
      assert(graft.streaming.IngestLedger.isDone(spark, ledger, bid),
        s"bid=$bid must stay done under a torn rollup")
      ChunkIndex.ingestBatchOnce(docs(batches(bid.toInt): _*), "doc_id",
        "text", w, dv, rm, ref, outDir, bid)
    }
    assert(spark.table(ref.chunksTable).count() === idxRows,
      "a torn rollup must not cause any batch to re-ingest")
    // NO LOSS: the next batch is not done and ingests normally; its
    // markDone sweeps the incomplete generation
    assert(!graft.streaming.IngestLedger.isDone(spark, ledger, 3L))
    ChunkIndex.ingestBatchOnce(docs(99L -> "totally new content here"),
      "doc_id", "text", w, dv, rm, ref, outDir, bid = 3L)
    assert(graft.streaming.IngestLedger.isDone(spark, ledger, 3L))
    assert(spark.table(ref.chunksTable).count() > idxRows)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$ledger/rollup/w=2")),
      "markDone's cleanup must sweep the torn generation")
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    ChunkIndex.drop(spark, ref)
  }
}
