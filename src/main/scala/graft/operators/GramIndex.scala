package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-RUN persistent ExactSubstr dedup index — the exact-substring
  * member of the persistent-index family ([[LshIndex]] near-dup,
  * [[IvfIndex]]/[[PqIndex]] ANN): the steady-state shape of
  * duplicated-substring removal over a corpus that arrives in deliveries,
  * where [[Dedup.exactSubstrRemove]] is the one-shot batch form
  * (Lee et al. 2022 ExactSubstr mode, via the dup-L-gram-window
  * reduction documented there).
  *
  * ONE catalog table persists the corpus fingerprints:
  *
  *  - `grams` (h, h2, cnt), bucketed on h — one row per distinct L-gram
  *    per ingest batch, carrying the double 64-bit fingerprint
  *    ([[Dedup.charGramFingerprints]]) and its occurrence count. An
  *    arriving batch probes it with a bucketed join on h (ZERO exchange
  *    on the corpus side) and confirms on h2.
  *
  * Ingest semantics are the only CAUSAL cross-delivery form of
  * ExactSubstr: a batch character is excised iff its window matches
  * content an EARLIER delivery holds (the corpus keeps its copy —
  * already-delivered documents cannot be retro-edited) or content
  * duplicated WITHIN the batch (remove-all, the batch form's rule).
  * On an EMPTY index the first clause is vacuous, so `ingest` of a whole
  * corpus as one batch IS `exactSubstrRemove` (spec-pinned), making the
  * index the incremental refinement of the batch operator, not a
  * different rule.
  *
  * The index records content SEEN, not content kept: each batch appends
  * its ORIGINAL text's gram counts, so a third delivery of boilerplate
  * removed from the second still dedups, and ingest stays one pass over
  * the batch (no re-hash of the cleaned text). Appends are
  * replay-absorbent for results — a replayed batch doubles `cnt`, and
  * the dedup rule only tests existence — the streaming wrapper's ledger
  * bounds the double-count to the crash window. Batch ids must not
  * re-ingest once their append landed (same id-uniqueness contract as
  * [[LshIndex]]): a re-ingested batch would find its own grams in the
  * index and excise everything.
  *
  * Storage: ~24 bytes per distinct (batch, gram) pair before [[compact]],
  * which sum-merges to one row per distinct corpus gram — O(corpus
  * characters) worst case, the same order as the published suffix-array
  * pipeline's SA (8 bytes/char PLUS the corpus it indexes), with heavy
  * shrink on natural corpora where grams repeat. The trade for that
  * footprint: per-delivery cost is O(batch + matches), never O(corpus) —
  * the re-dedup a pipeline without an index re-pays per delivery.
  *
  * Single-writer, enforced on storage: ingest/compact take the same
  * atomic create-if-absent lease as the rest of the family (HDFS/local
  * semantics; see [[LshIndex]] for the object-store caveat). The table
  * is EXTERNAL — [[attach]] re-registers the bucketing DDL over the
  * files in a fresh session/process.
  */
object GramIndex {

  /** Names + bucket count of one persistent index. `tag` must be unique
    * per (index, warehouse). */
  final case class Ref(tag: String, buckets: Int) {
    def gramsTable: String = s"graft_gramidx_grams_$tag"
  }

  private def location(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"), table)
  private def hfs(spark: SparkSession, p: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def leaseLoc(spark: SparkSession, ref: Ref): org.apache.hadoop.fs.Path =
    location(spark, s"graft_gramidx_lease_${ref.tag}")

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
            s"GramIndex.breakLease after confirming it is dead")
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
    spark.sql(s"DROP TABLE IF EXISTS ${ref.gramsTable}")
    val loc = location(spark, ref.gramsTable)
    hfs(spark, loc).delete(loc, true)
    breakLease(spark, ref)
  }

  private def register(spark: SparkSession, ref: Ref,
                       knownSchema: Option[String] = None): Unit = {
    val loc = location(spark, ref.gramsTable)
    require(hfs(spark, loc).exists(loc), s"no index files at $loc — nothing to attach")
    val schema = knownSchema.getOrElse(spark.read.parquet(loc.toString).schema.toDDL)
    spark.sql(s"""CREATE TABLE ${ref.gramsTable} ($schema) USING parquet
      CLUSTERED BY (h) SORTED BY (h) INTO ${ref.buckets} BUCKETS
      LOCATION '${loc.toString}'""")
  }

  /** Re-register an existing on-disk index in a session whose catalog
    * does not know it — the files alone carry the data. */
  def attach(spark: SparkSession, ref: Ref): Unit =
    if (!spark.catalog.tableExists(ref.gramsTable)) register(spark, ref)

  private def appendBucketed(df: DataFrame, ref: Ref): Unit = {
    val spark = df.sparkSession
    val w = df.write.mode("append").format("parquet")
      .bucketBy(ref.buckets, "h").sortBy("h")
    if (spark.catalog.tableExists(ref.gramsTable)) w.saveAsTable(ref.gramsTable)
    else w.option("path", location(spark, ref.gramsTable).toString)
      .saveAsTable(ref.gramsTable)
  }

  /** Ingest one delivery: return the batch CLEANED under the causal
    * cross-delivery ExactSubstr rule — (idCol, clean_text, n_spans,
    * n_removed), every batch doc present — then fold the batch's gram
    * counts into the index. Results materialize BEFORE the append, so a
    * batch never dedups against itself through the index.
    *
    * Cost per delivery: one compiled hash pass over the batch, one
    * batch-sized count shuffle on 8-byte keys, one bucketed probe join
    * that reads the corpus pre-partitioned (only matching-bucket rows),
    * and the doc-keyed excision — O(batch + matches), no corpus scan. */
  def ingest(batch: DataFrame, idCol: String, textCol: String,
             minLen: Int, ref: Ref): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val spark = batch.sparkSession
    withLease(spark, ref, "ingest") {
      val docs = batch.select(col(idCol).as("_d"), col(textCol).as("_t"),
        length(col(textCol)).cast("long").as("_len"))
      val grams = Dedup.charGramFingerprints(docs, minLen).cache()
      // within-batch duplicates: remove-all, same as the batch operator
      val withinDup = grams.groupBy(col("h"), col("h2"))
        .agg(count(lit(1)).as("_c")).filter(col("_c") >= 2)
        .select("h", "h2")
      // vs corpus: the probe joins on h ALONE — the bucket column, so the
      // corpus side reads pre-partitioned with zero exchange — and h2
      // confirms post-join (a join on (h, h2) would not be satisfied by
      // the h-bucketing and would shuffle the corpus)
      import spark.implicits._
      val corpusDup =
        if (!spark.catalog.tableExists(ref.gramsTable))
          Seq.empty[(Long, Long)].toDF("h", "h2")
        else spark.table(ref.gramsTable).select(col("h"), col("h2").as("_ih2"))
          .join(grams.select("h", "h2").distinct(), Seq("h"))
          .filter(col("_ih2") === col("h2"))
          .select("h", "h2").distinct()
      val dupPos = grams
        .join(withinDup.unionByName(corpusDup).distinct(), Seq("h", "h2"), "left_semi")
        .select(col("_d"), col("pos"))
      val out = Dedup.excise(docs, dupPos, minLen, idCol).localCheckpoint()
      appendBucketed(
        grams.groupBy(col("h"), col("h2")).agg(count(lit(1)).as("cnt")), ref)
      grams.unpersist()
      out
    }
  }

  /** Read-only form of the dedup rule — clean `batch` against the index
    * WITHOUT folding it in (audits, what-if runs; no lease needed, the
    * bucketed read is snapshot-consistent per job). Within-batch
    * duplicates still apply: the rule is the same, only the append is
    * withheld. */
  def dedupAgainst(batch: DataFrame, idCol: String, textCol: String,
                   minLen: Int, ref: Ref): DataFrame = {
    val spark = batch.sparkSession
    attach(spark, ref)
    val docs = batch.select(col(idCol).as("_d"), col(textCol).as("_t"),
      length(col(textCol)).cast("long").as("_len"))
    val grams = Dedup.charGramFingerprints(docs, minLen)
    val withinDup = grams.groupBy(col("h"), col("h2"))
      .agg(count(lit(1)).as("_c")).filter(col("_c") >= 2).select("h", "h2")
    val corpusDup = spark.table(ref.gramsTable)
      .select(col("h"), col("h2").as("_ih2"))
      .join(grams.select("h", "h2").distinct(), Seq("h"))
      .filter(col("_ih2") === col("h2"))
      .select("h", "h2").distinct()
    val dupPos = grams
      .join(withinDup.unionByName(corpusDup).distinct(), Seq("h", "h2"), "left_semi")
      .select(col("_d"), col("pos"))
    Dedup.excise(docs, dupPos, minLen, idCol)
  }

  /** Compact: sum-merge to ONE row per distinct corpus gram and one file
    * per bucket (every ingest appends a file per bucket; a long-lived
    * index accumulates deliveries × buckets files AND repeats gram rows
    * across deliveries). Content-equivalent for the dedup rule (existence
    * is preserved; `cnt` sums), crash-durable via the family's
    * rename-aside swap: the compacted copy lands as a `_compacting`
    * sibling before the live table is touched, live files rename ASIDE
    * (never deleted before the replacement is in), and a re-run performs
    * recovery in its preamble. */
  def compact(spark: SparkSession, ref: Ref): Unit =
    withLease(spark, ref, "compact") {
      val tbl = ref.gramsTable
      val tmp = s"${tbl}_compacting"
      val tmpLoc = location(spark, tmp)
      val loc = location(spark, tbl)
      val oldLoc = location(spark, s"${tbl}_old")
      val f = hfs(spark, tmpLoc)
      if (!f.exists(loc) && f.exists(oldLoc)) LshIndex.mustRename(f, oldLoc, loc)
      if (!spark.catalog.tableExists(tbl)) register(spark, ref)
      val schemaDdl = spark.table(tbl).schema.toDDL
      spark.sql(s"DROP TABLE IF EXISTS $tmp")
      f.delete(tmpLoc, true)
      // localCheckpoint breaks the scan's logical bucketing so the
      // repartition genuinely shuffles (see LshIndex.compactOne)
      val mergedRows = spark.table(tbl).localCheckpoint(true)
        .groupBy(col("h"), col("h2")).agg(sum(col("cnt")).as("cnt"))
        .repartition(ref.buckets, col("h"))
      val w = mergedRows.write.mode("append").format("parquet")
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

  /** Maintain the index from a document STREAM: each micro-batch runs
    * [[ingest]] inside foreachBatch — cleaned docs land in
    * `outDir/clean/batch_id=<id>` with per-batch OVERWRITE and a
    * `_ledger` parquet records completed batch ids, so a replayed,
    * already-ledgered batch is skipped whole (the append runs once per
    * batch). A crash BETWEEN append and ledger re-ingests on restart:
    * the index double-counts that batch's grams (existence-only rule —
    * results unchanged) and, because the batch's grams are now indexed,
    * the REPLAYED cleaning excises the batch's internal first
    * occurrences too — the ledgered output was already written by the
    * first attempt, so downstream reads stay correct; the window is the
    * same one [[LshIndex.startStreamingIngest]] documents. */
  def startStreamingIngest(docs: DataFrame, idCol: String, textCol: String,
                           minLen: Int, ref: Ref, outDir: String,
                           checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val ledger = new org.apache.hadoop.fs.Path(outDir, "_ledger")
        val done = hfs(spark, ledger).exists(ledger) &&
          spark.read.parquet(ledger.toString)
            .where(col("batch_id") === bid).head(1).nonEmpty
        if (!done) {
          ingest(batch.toDF(), idCol, textCol, minLen, ref)
            .write.mode("overwrite")
            .parquet(s"$outDir/clean/batch_id=$bid")
          Seq(bid).toDF("batch_id").write.mode("append")
            .parquet(ledger.toString)
        }
        ()
      }
      .start()
}
