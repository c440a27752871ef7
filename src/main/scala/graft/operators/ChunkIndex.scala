package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-RUN persistent CDC chunk-claim index — the content-defined-chunk
  * member of the persistent-index family ([[GramIndex]] exact-substring,
  * [[LshIndex]] near-dup, [[IvfIndex]]/[[PqIndex]] ANN): the steady-state
  * shape of duplicated-CHUNK suppression over a corpus that arrives in
  * deliveries, where [[Dedup.dedupCdcKeepFirst]] is the one-shot batch
  * form and streaming/StreamingDedup.ChunkClaim the in-stream form
  * (reference anchor: the corpus-side role of SURVEY §2 LLM-pipeline
  * dedup).
  *
  * ONE catalog table persists the claims:
  *
  *  - `chunks` (h, h2, cnt, delivery), bucketed on h — one row per
  *    distinct batch chunk per ingest delivery, carrying the DOUBLE
  *    64-bit fingerprint (fnv1a64 + xxhash64 of the chunk text — the
  *    [[Dedup.charGramFingerprints]] currency; keep-first under a
  *    collided single hash would REMOVE a distinct chunk, so the claim
  *    rule is collision-exact at ~2^-128 per pair), its occurrence
  *    count in that delivery, and the delivery id that appended it.
  *
  * Ingest semantics are the CAUSAL cross-delivery form of CDC keep-first
  * dedup: a batch chunk is suppressed iff an EARLIER delivery claimed
  * its fingerprints (already-delivered documents cannot be retro-edited)
  * or an earlier (doc, position) occurrence WITHIN the batch did —
  * keep-first by lexicographic min, the batch operator's rule. On an
  * EMPTY index the first clause is vacuous, so `ingest` of a whole
  * corpus as one delivery IS [[Dedup.dedupCdcKeepFirst]] (spec-pinned);
  * ingesting doc-id-ordered deliveries reproduces the batch operator's
  * global keep-first exactly (gate qg0 pins it on qfy's oracle). The
  * index records content SEEN, not content kept: every distinct batch
  * chunk appends, so a chunk suppressed in delivery 3 still suppresses
  * delivery 4's copy without re-reading delivery 1.
  *
  * REPLAY CONTRACT ([[GramIndex]]'s, verbatim): every append is tagged
  * with the delivery id and the corpus probe EXCLUDES the current
  * delivery's own rows, so a retried `ingest` with the SAME id is
  * byte-identical even when the first attempt's append landed (fully or
  * torn). The only replay residue is duplicate rows for that delivery —
  * invisible to the existence-only claim rule and cancelled EXACTLY by
  * [[compact]] (per-delivery max before the cross-delivery sum) or
  * retracted by [[recoverDelivery]]. Delivery ids must be stable across
  * retries and unique across deliveries.
  *
  * Cost per delivery: one codegen'd CDC pass over the batch
  * (CdcCutsExpr), one batch-sized shuffle on the 8-byte h, one bucketed
  * probe join reading the corpus pre-partitioned with h2 confirmed
  * post-join (a join on (h, h2) would not be satisfied by the
  * h-bucketing and would shuffle the corpus), one per-doc reassembly —
  * O(batch + matches), never O(corpus). Storage: ~28 bytes per distinct
  * (delivery, chunk); [[compact]] merges to one row per distinct corpus
  * chunk and one file per bucket.
  *
  * Single-writer, enforced on storage with the family's atomic
  * create-if-absent lease (HDFS/local semantics — see [[LshIndex]] for
  * the object-store caveat). The table is EXTERNAL: [[attach]]
  * re-registers the bucketing DDL over the files in a fresh
  * session/process, and ingest auto-attaches (recovering a crashed
  * [[compact]]'s rename-aside state) so an on-disk index is never
  * silently treated as empty. */
object ChunkIndex {

  /** Names + bucket count of one persistent index. `tag` must be unique
    * per (index, warehouse). */
  final case class Ref(tag: String, buckets: Int) {
    def chunksTable: String = s"graft_chunkidx_chunks_$tag"
  }

  /** Delivery tag [[compact]] rewrites merged rows under; user delivery
    * ids must not collide with it. */
  val CompactedDelivery = "_compacted"

  private def location(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"), table)
  private def hfs(spark: SparkSession, p: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def leaseLoc(spark: SparkSession, ref: Ref): org.apache.hadoop.fs.Path =
    location(spark, s"graft_chunkidx_lease_${ref.tag}")

  private def withLease[T](spark: SparkSession, ref: Ref, who: String)(body: => T): T = {
    val p = leaseLoc(spark, ref)
    val f = hfs(spark, p)
    val out = try f.create(p, false) catch {
      case _: java.io.IOException =>
        val holder = try {
          val in = f.open(p)
          try new String(org.apache.commons.io.IOUtils.toByteArray(in),
            java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        } catch { case _: java.io.IOException => "<unreadable>" }
        throw new IllegalStateException(
          s"index '${ref.tag}' is write-leased by '$holder' — concurrent " +
            s"ingest/compact is a data-loss race; if the holder crashed, " +
            s"ChunkIndex.breakLease after confirming it is dead")
    }
    try {
      out.write(who.getBytes(java.nio.charset.StandardCharsets.UTF_8)); out.close()
      body
    } finally { f.delete(p, false); () }
  }

  /** Remove a crashed writer's lingering lease. ONLY safe once the
    * operator has confirmed no ingest/compact is live. */
  def breakLease(spark: SparkSession, ref: Ref): Unit = {
    val p = leaseLoc(spark, ref)
    hfs(spark, p).delete(p, false); ()
  }

  /** Destroy the index: catalog entry AND files (lease included). */
  def drop(spark: SparkSession, ref: Ref): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${ref.chunksTable}")
    val loc = location(spark, ref.chunksTable)
    hfs(spark, loc).delete(loc, true)
    breakLease(spark, ref)
  }

  private def register(spark: SparkSession, ref: Ref,
                       knownSchema: Option[String] = None): Unit = {
    val loc = location(spark, ref.chunksTable)
    require(hfs(spark, loc).exists(loc), s"no index files at $loc — nothing to attach")
    val schema = knownSchema.getOrElse(spark.read.parquet(loc.toString).schema.toDDL)
    spark.sql(s"""CREATE TABLE ${ref.chunksTable} ($schema) USING parquet
      CLUSTERED BY (h) SORTED BY (h) INTO ${ref.buckets} BUCKETS
      LOCATION '${loc.toString}'""")
  }

  /** Re-register an existing on-disk index in a session whose catalog
    * does not know it — the files alone carry the data. */
  def attach(spark: SparkSession, ref: Ref): Unit =
    if (!spark.catalog.tableExists(ref.chunksTable)) register(spark, ref)

  /** Writer-side preamble: finish a crashed [[compact]]'s rename-aside
    * swap if one is pending, then register an on-disk index the session
    * catalog does not know. Returns whether index content exists. */
  private def attachForWrite(spark: SparkSession, ref: Ref): Boolean = {
    val loc = location(spark, ref.chunksTable)
    val oldLoc = location(spark, s"${ref.chunksTable}_old")
    val f = hfs(spark, loc)
    if (!f.exists(loc) && f.exists(oldLoc)) LshIndex.mustRename(f, oldLoc, loc)
    if (spark.catalog.tableExists(ref.chunksTable)) true
    else if (f.exists(loc)) { register(spark, ref); true }
    else false
  }

  private def appendBucketed(df: DataFrame, ref: Ref): Unit = {
    val spark = df.sparkSession
    val w = df.write.mode("append").format("parquet")
      .bucketBy(ref.buckets, "h").sortBy("h")
    if (spark.catalog.tableExists(ref.chunksTable)) w.saveAsTable(ref.chunksTable)
    else w.option("path", location(spark, ref.chunksTable).toString)
      .saveAsTable(ref.chunksTable)
  }

  /** The batch's CDC chunks with both fingerprints. */
  private def fingerprinted(batch: DataFrame, idCol: String, textCol: String,
                            window: Int, divisor: Long,
                            remainder: Long): DataFrame =
    TextPipeline.cdcChunks(batch, idCol, textCol, window, divisor, remainder)
      .select(col(idCol).as("_d"), col("chunk_idx"), col("chunk_text"),
        graft.functions.Fnv1a64Expr(col("chunk_text")).as("h"),
        xxhash64(col("chunk_text")).as("h2"))

  /** The keep-first suppression against `corpusDup` (earlier-delivery
    * claims as (h, h2)): within-batch firsts by lexicographic min
    * (doc, idx), minus corpus-claimed fingerprints, reassembled per doc —
    * (idCol, n_chunks, n_kept, text_dedup), docs with no survivor drop.
    * Chunk identity is the (h, h2) PAIR everywhere (16-byte keys — the
    * batch operators' documented 100-TB shape, made physical). */
  private def keepFirst(chunks: DataFrame, corpusDup: DataFrame,
                        idCol: String): DataFrame = {
    val first = chunks.groupBy(col("h"), col("h2"))
      .agg(min(struct(col("_d"), col("chunk_idx"))).as("_m"))
    val perDoc = chunks.groupBy(col("_d"))
      .agg(count(lit(1)).as("n_chunks"))
    chunks.join(first, Seq("h", "h2"))
      .filter(col("_m._d") === col("_d") &&
        col("_m.chunk_idx") === col("chunk_idx"))
      .join(corpusDup, Seq("h", "h2"), "left_anti")
      .groupBy(col("_d"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
          struct(col("chunk_idx"), col("chunk_text")))),
          x => x.getField("chunk_text")), "").as("text_dedup"))
      .join(perDoc, Seq("_d"))
      .select(col("_d").as(idCol), col("n_chunks"), col("n_kept"),
        col("text_dedup"))
  }

  /** [[ingest]] with a generated unique-per-call delivery id — for
    * callers who do not need crashed-retry idempotence (a retry MUST
    * re-use the first attempt's id; with a fresh id the crashed
    * attempt's claims look like an earlier delivery and the retry
    * over-suppresses — [[recoverDelivery]] first in that case). */
  def ingest(batch: DataFrame, idCol: String, textCol: String, window: Int,
             divisor: Long, remainder: Long, ref: Ref): DataFrame =
    ingest(batch, idCol, textCol, window, divisor, remainder, ref,
      delivery = java.util.UUID.randomUUID().toString)

  /** Ingest one delivery: return the batch deduped under the causal
    * cross-delivery keep-first rule — (idCol, n_chunks, n_kept,
    * text_dedup), docs left with no surviving chunk drop (the batch
    * operator's contract) — then fold the batch's distinct chunk
    * fingerprints into the index tagged with `delivery`. Results
    * materialize BEFORE the append so the common path never reads the
    * index twice. */
  def ingest(batch: DataFrame, idCol: String, textCol: String, window: Int,
             divisor: Long, remainder: Long, ref: Ref,
             delivery: String): DataFrame = {
    require(delivery.nonEmpty && delivery != CompactedDelivery,
      s"delivery id must be non-empty and not '$CompactedDelivery'")
    val spark = batch.sparkSession
    withLease(spark, ref, "ingest") {
      val hasCorpus = attachForWrite(spark, ref)
      val chunks = fingerprinted(batch, idCol, textCol, window, divisor,
        remainder).cache()
      import spark.implicits._
      // probe on h ALONE (the bucket column — corpus side pre-partitioned,
      // zero exchange), confirm h2 post-join; exclude THIS delivery's own
      // rows (a crashed earlier attempt of this same batch, never corpus)
      val corpusDup =
        if (!hasCorpus) Seq.empty[(Long, Long)].toDF("h", "h2")
        else spark.table(ref.chunksTable)
          .filter(col("delivery") =!= lit(delivery))
          .select(col("h"), col("h2").as("_ih2"))
          .join(chunks.select("h", "h2").distinct(), Seq("h"))
          .filter(col("_ih2") - col("h2") === 0L)
          .select("h", "h2").distinct()
      val out = keepFirst(chunks, corpusDup, idCol).localCheckpoint()
      appendBucketed(
        chunks.groupBy(col("h"), col("h2")).agg(count(lit(1)).as("cnt"))
          .withColumn("delivery", lit(delivery)), ref)
      chunks.unpersist()
      out
    }
  }

  /** Read-only form — dedup `batch` against the index WITHOUT folding it
    * in (audits, what-if runs; no lease, the bucketed read is
    * snapshot-consistent per job). Within-batch keep-first still applies. */
  def dedupAgainst(batch: DataFrame, idCol: String, textCol: String,
                   window: Int, divisor: Long, remainder: Long,
                   ref: Ref): DataFrame = {
    val spark = batch.sparkSession
    attach(spark, ref)
    val chunks = fingerprinted(batch, idCol, textCol, window, divisor, remainder)
    val corpusDup = spark.table(ref.chunksTable)
      .select(col("h"), col("h2").as("_ih2"))
      .join(chunks.select("h", "h2").distinct(), Seq("h"))
      .filter(col("_ih2") - col("h2") === 0L)
      .select("h", "h2").distinct()
    keepFirst(chunks, corpusDup, idCol)
  }

  /** Rewrite the live table through the family's crash-durable
    * rename-aside swap ([[GramIndex]]'s discipline: the transformed copy
    * is complete on storage before the live table is touched; a re-run
    * recovers in [[attachForWrite]]'s preamble). */
  private def rewriteTable(spark: SparkSession, ref: Ref)
                          (transform: DataFrame => DataFrame): Unit = {
    val tbl = ref.chunksTable
    val tmp = s"${tbl}_compacting"
    val tmpLoc = location(spark, tmp)
    val loc = location(spark, tbl)
    val oldLoc = location(spark, s"${tbl}_old")
    val f = hfs(spark, tmpLoc)
    if (!f.exists(loc) && f.exists(oldLoc)) LshIndex.mustRename(f, oldLoc, loc)
    if (!spark.catalog.tableExists(tbl)) register(spark, ref)
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    f.delete(tmpLoc, true)
    // localCheckpoint breaks the scan's logical bucketing so the
    // repartition genuinely shuffles (see LshIndex.compactOne)
    val newRows = transform(spark.table(tbl).localCheckpoint(true))
      .repartition(ref.buckets, col("h"))
    val schemaDdl = newRows.schema.toDDL
    val w = newRows.write.mode("append").format("parquet")
      .bucketBy(ref.buckets, "h").sortBy("h")
    w.option("path", tmpLoc.toString).saveAsTable(tmp)
    spark.sql(s"DROP TABLE $tbl")
    spark.sql(s"DROP TABLE $tmp") // catalog entry only; files stay
    f.delete(oldLoc, true)
    LshIndex.mustRename(f, loc, oldLoc)
    LshIndex.mustRename(f, tmpLoc, loc)
    register(spark, ref, Some(schemaDdl))
    f.delete(oldLoc, true); ()
  }

  /** Compact: merge to ONE row per distinct corpus chunk and one file
    * per bucket. A replayed delivery's duplicate rows carry identical
    * (h, h2, cnt, delivery) values, so the per-delivery `max` cancels
    * them EXACTLY before the cross-delivery sum. Merged rows re-tag
    * [[CompactedDelivery]], collapsing delivery lineage: do NOT compact
    * while a delivery is in doubt (a crashed, not-yet-retried ingest —
    * its retry could no longer self-exclude); retry or
    * [[recoverDelivery]] first. */
  def compact(spark: SparkSession, ref: Ref): Unit =
    withLease(spark, ref, "compact") {
      require(attachForWrite(spark, ref),
        s"no index files for '${ref.tag}' — nothing to compact")
      rewriteTable(spark, ref) { t =>
        t.groupBy(col("h"), col("h2"), col("delivery"))
          .agg(max(col("cnt")).as("cnt"))
          .groupBy(col("h"), col("h2")).agg(sum(col("cnt")).as("cnt"))
          .withColumn("delivery", lit(CompactedDelivery))
      }
    }

  /** Retract one delivery's claims — the mechanical recovery for a
    * crashed ingest whose retry cannot re-use the original delivery id.
    * No-op for ids already collapsed by [[compact]]. */
  def recoverDelivery(spark: SparkSession, ref: Ref, delivery: String): Unit =
    withLease(spark, ref, "recoverDelivery") {
      require(delivery != CompactedDelivery,
        s"cannot retract '$CompactedDelivery' — compaction collapsed lineage")
      if (attachForWrite(spark, ref))
        rewriteTable(spark, ref)(_.filter(col("delivery") =!= lit(delivery)))
    }

  /** The stable delivery id a stream's micro-batch `bid` ingests under. */
  def streamDelivery(bid: Long): String = s"stream:$bid"

  /** One micro-batch of [[startStreamingIngest]], exposed for planted
    * replay tests: ledger check → [[ingest]] under the batch-derived
    * delivery id → per-batch clean-output OVERWRITE → ledger mark
    * ([[graft.streaming.IngestLedger]], watermark-compacted). Crash
    * anywhere and the re-execution is byte-identical. */
  def ingestBatchOnce(batch: DataFrame, idCol: String, textCol: String,
                      window: Int, divisor: Long, remainder: Long, ref: Ref,
                      outDir: String, bid: Long): Unit = {
    val spark = batch.sparkSession
    val ledger = s"$outDir/_ledger"
    if (!graft.streaming.IngestLedger.isDone(spark, ledger, bid)) {
      ingest(batch, idCol, textCol, window, divisor, remainder, ref,
          delivery = streamDelivery(bid))
        .write.mode("overwrite")
        .parquet(s"$outDir/dedup/batch_id=$bid")
      graft.streaming.IngestLedger.markDone(spark, ledger, bid)
    }
  }

  /** Maintain the index from a document STREAM — the fit-once,
    * ingest-forever deployment shape the other index families carry,
    * giving CDC dedup a cross-RUN claim store where
    * StreamingDedup.ChunkClaim keeps claims in the query's own state. */
  def startStreamingIngest(docs: DataFrame, idCol: String, textCol: String,
                           window: Int, divisor: Long, remainder: Long,
                           ref: Ref, outDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
        ingestBatchOnce(batch.toDF(), idCol, textCol, window, divisor,
          remainder, ref, outDir, bid)
      }
      .start()
}
