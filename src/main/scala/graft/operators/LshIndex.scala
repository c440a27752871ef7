package graft.operators

import graft.functions.Hashes
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-RUN persistent MinHash/LSH near-duplicate index — the steady-state
  * shape of a dedup-at-ingest service over a growing 100-TB corpus
  * (reference: the corpus-side role of SURVEY §2 LLM-pipeline near-dedup;
  * the in-session twin is [[Dedup.minhashNewVsCorpus]], the in-stream twin
  * the keyed claim index in streaming/StreamingDedup.scala).
  *
  * Three catalog tables persist the corpus artifacts, each BUCKETED on its
  * join key so every ingest touches the corpus with ZERO exchange on the
  * corpus side:
  *
  *  - `banded`  (doc, band, bucket), bucketed (band, bucket) — candidate
  *    generation: the batch's band buckets shuffle into the index's
  *    bucketing; the index itself is read pre-partitioned.
  *  - `sigs`    (doc, sig), bucketed (doc) — signature-agreement pre-filter
  *    lookups for the corpus side of a candidate pair.
  *  - `sh`      (doc, shs), bucketed (doc) — exact-Jaccard verification
  *    lookups (the one verify formula, [[Dedup.verifyJaccard]]).
  *
  * Each [[ingest]] batch pays O(|batch| + collisions): within-batch pairs
  * via self-banding (batch-side lookups broadcast — a batch is small),
  * batch-vs-corpus pairs via the bucketed index join (only the candidate
  * set shuffles), then the batch's own artifacts are APPENDED into the
  * three tables — bucketed appends add one file per bucket, never rewrite
  * the corpus. Corpus hashing is paid exactly once, at the batch's own
  * ingest.
  *
  * The tables are EXTERNAL (explicit warehouse location): dropping the
  * catalog entry keeps the files, and [[attach]] re-registers them in a
  * fresh session/process from the directory alone — restarts and other
  * jobs (the streaming ingest wrapper, offline audits) see the same index.
  * Doc ids must be unique across the index's lifetime (re-ingesting an id
  * would propose self-pairs); dedup services key docs by content hash or a
  * monotonically assigned ingest id, both of which satisfy this.
  */
object LshIndex {

  /** Names + bucket count of one persistent index. `tag` must be unique
    * per (index, warehouse) — collide and [[drop]] destroys both. */
  final case class Ref(tag: String, buckets: Int) {
    def bandedTable: String = s"graft_lshidx_banded_$tag"
    def sigsTable: String = s"graft_lshidx_sigs_$tag"
    def shTable: String = s"graft_lshidx_sh_$tag"
    /** (table, bucket columns) triples — bucketing IS the contract. */
    def layout: Seq[(String, Seq[String])] = Seq(
      bandedTable -> Seq("band", "bucket"),
      sigsTable -> Seq("doc"),
      shTable -> Seq("doc"))
  }

  // locations resolve through Hadoop FileSystem against the warehouse URI
  // (not java.io.File), so an hdfs:// or s3a:// warehouse carries the
  // index on the same storage the catalog points at
  private def location(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"), table)
  private def hfs(spark: SparkSession, p: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def leaseLoc(spark: SparkSession, ref: Ref): org.apache.hadoop.fs.Path =
    location(spark, s"graft_lshidx_lease_${ref.tag}")

  /** The index is SINGLE-WRITER: [[ingest]] and [[compact]] both mutate
    * the three tables, and a compact racing an ingest loses the ingest's
    * appends (the rebuild snapshots before they land). The contract is
    * enforced, not prose: writers take an exclusive on-storage lease —
    * atomic create-if-absent of a lease file — and a second writer fails
    * fast with the holder's tag instead of corrupting the index. The
    * lease releases on completion; after a CRASH it lingers and must be
    * broken explicitly ([[breakLease]]) once the operator confirms no
    * writer is live — the standard storage-lease trade-off.
    *
    * STORAGE ASSUMPTION: the primitive is `FileSystem.create(path,
    * overwrite=false)` as an atomic create-if-absent, which HDFS and
    * local filesystems guarantee but object stores do NOT (s3a has no
    * atomic exclusive create — two writers can both "win"). On an
    * object-store warehouse, mutual exclusion needs a store-side
    * primitive instead (S3 conditional PUT / If-None-Match, or an
    * external lock table); this lease is HDFS/local-correct only. */
  /** Hadoop `FileSystem.rename` reports failure as `false`, not an
    * exception — and a swap step that silently fails voids the
    * crash-durability story (renaming the compacted copy in while the
    * live directory still exists nests it INSIDE the live dir on most
    * implementations). Every swap/recovery rename goes through this. */
  private[graft] def mustRename(f: org.apache.hadoop.fs.FileSystem,
                                src: org.apache.hadoop.fs.Path,
                                dst: org.apache.hadoop.fs.Path): Unit =
    require(f.rename(src, dst), s"rename $src -> $dst failed")

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
            s"LshIndex.breakLease after confirming it is dead")
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

  /** Destroy the index: catalog entries AND files (lease included). */
  def drop(spark: SparkSession, ref: Ref): Unit = {
    ref.layout.foreach { case (tbl, _) =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = location(spark, tbl)
      hfs(spark, loc).delete(loc, true)
    }
    breakLease(spark, ref)
  }

  /** Register the bucketing DDL for `tbl` over its on-disk files.
    * `knownSchema` skips the parquet footer inference when the caller
    * already holds the schema (compact does — it just read the table). */
  private def register(spark: SparkSession, ref: Ref, tbl: String,
                       cols: Seq[String],
                       knownSchema: Option[String] = None): Unit = {
    val loc = location(spark, tbl)
    require(hfs(spark, loc).exists(loc), s"no index files at $loc — nothing to attach")
    val schema = knownSchema.getOrElse(spark.read.parquet(loc.toString).schema.toDDL)
    val cl = cols.mkString(", ")
    spark.sql(s"""CREATE TABLE $tbl ($schema) USING parquet
      CLUSTERED BY ($cl) SORTED BY ($cl) INTO ${ref.buckets} BUCKETS
      LOCATION '${loc.toString}'""")
  }

  /** Re-register an existing on-disk index in a session whose catalog does
    * not know it (fresh process, different job). The files alone carry the
    * data; this re-asserts the bucketing DDL over them, so bucketed reads
    * (zero corpus-side exchange) survive restarts. */
  def attach(spark: SparkSession, ref: Ref): Unit = ref.layout.foreach { case (tbl, cols) =>
    if (!spark.catalog.tableExists(tbl)) register(spark, ref, tbl, cols)
  }

  /** Writer-side preamble: finish a crashed [[compact]]'s rename-aside
    * swap where one is pending, then register any on-disk table the
    * session catalog does not know. Returns whether index content exists
    * — false only for a brand-new index. Without this, a fresh process
    * that forgot [[attach]] would probe an EMPTY corpus and silently
    * miss every cross-delivery pair. */
  private def attachForWrite(spark: SparkSession, ref: Ref): Boolean = {
    ref.layout.foreach { case (tbl, cols) =>
      val loc = location(spark, tbl)
      val oldLoc = location(spark, s"${tbl}_old")
      val f = hfs(spark, loc)
      if (!f.exists(loc) && f.exists(oldLoc)) mustRename(f, oldLoc, loc)
      if (!spark.catalog.tableExists(tbl) && f.exists(loc))
        register(spark, ref, tbl, cols)
      if (spark.catalog.tableExists(tbl) &&
          !spark.table(tbl).columns.contains("delivery")) {
        // pre-delivery-lineage table (round-12 schema): without this, the
        // first ingest's `delivery` filter dies with an opaque
        // unresolved-column error and the append would schema-mismatch.
        // Migrate through the crash-durable rewrite, tagging legacy rows
        // [[LegacyDelivery]] (their delivery lineage is unknowable, so
        // recoverDelivery of a pre-migration delivery is a no-op).
        compactOne(spark, ref, tbl, cols,
          _.withColumn("delivery", lit(LegacyDelivery)))
      }
    }
    spark.catalog.tableExists(ref.bandedTable)
  }

  /** Delivery tag the legacy-schema migration rewrites pre-round-13 rows
    * under; user delivery ids must not collide with it. */
  val LegacyDelivery = "_legacy"

  /** Integrity check for the one inconsistency [[ingest]]'s crash window
    * can leave: the three artifact appends are independent (concurrent)
    * jobs, so a writer that dies mid-batch can land a doc's rows in SOME
    * of banded/sigs/sh but not all — candidate generation then sees docs
    * whose signatures/shingles are missing (silently absent from
    * verification), or vice versa. Returns the DELTA, one row per
    * inconsistent doc: (doc, present) where `present` names the tables
    * (of "banded"/"sigs"/"sh") that hold it — empty result = consistent.
    *
    * Cost: one full scan + distinct per table (a maintenance-window op
    * like [[compact]], not an ingest-path one; sigs/sh distinct on doc is
    * bucket-local, banded's crosses buckets).
    *
    * REPAIR PATH: [[repairTorn]] — rewrites each table minus the
    * orphans (rows can't be deleted from parquet in place), after which
    * the orphaned docs re-[[ingest]] whole under their SAME ids (their
    * pairs were never returned, and the id-uniqueness rule forbids only
    * ids whose artifacts are fully live). */
  def fsck(spark: SparkSession, ref: Ref): DataFrame = {
    attach(spark, ref)
    Seq(ref.bandedTable -> "banded", ref.sigsTable -> "sigs",
        ref.shTable -> "sh")
      .map { case (tbl, tag) =>
        spark.table(tbl).select(col("doc")).distinct()
          .withColumn("tbl", lit(tag)) }
      .reduce(_ unionByName _)
      .groupBy("doc").agg(sort_array(collect_set(col("tbl"))).as("present"))
      .filter(size(col("present")) < 3)
  }

  /** The [[fsck]] repair path, executable: rewrites each table MINUS the
    * orphaned docs' partial artifacts (a compact-style bucketed rewrite
    * per table — same rename-aside swap, under the write lease), leaving
    * the doc sets equal again. Returns the purged orphan count. The
    * orphaned docs can then be re-[[ingest]]ed whole under their SAME
    * ids: their pairs were never returned (the batch died before its
    * ingest completed), and the id-uniqueness rule only forbids ids
    * whose artifacts are fully live. */
  def repairTorn(spark: SparkSession, ref: Ref): Long =
    withLease(spark, ref, "repair") {
      val orphans = fsck(spark, ref).select(col("doc")).localCheckpoint(true)
      val n = orphans.count()
      if (n > 0) ref.layout.foreach { case (tbl, cols) =>
        compactOne(spark, ref, tbl, cols,
          df => df.join(broadcast(orphans), Seq("doc"), "left_anti"))
      }
      n
    }

  /** [[fsck]] as an assertion: throws naming (a sample of) the
    * inconsistent docs and where each was found. */
  def verifyConsistent(spark: SparkSession, ref: Ref): Unit = {
    val bad = fsck(spark, ref).limit(20).collect()
    if (bad.nonEmpty) {
      val detail = bad.map(r => s"${r.get(0)} in " +
        r.getSeq[String](1).mkString("{", ",", "}")).mkString("; ")
      throw new IllegalStateException(
        s"index '${ref.tag}' has ${bad.length}+ docs with partial " +
          s"artifacts (a crashed ingest's torn append): $detail — see " +
          s"LshIndex.fsck for the repair path")
    }
  }

  private def appendBucketed(df: DataFrame, tbl: String, buckets: Int,
                             cols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val w = df.write.mode("append").format("parquet")
      .bucketBy(buckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
    if (spark.catalog.tableExists(tbl)) w.saveAsTable(tbl)
    else w.option("path", location(spark, tbl).toString).saveAsTable(tbl)
  }

  /** [[ingest]] with a generated unique-per-call delivery id — for
    * callers who do not need the crashed-retry idempotence (a retry MUST
    * re-use the first attempt's id to self-exclude; with a fresh id the
    * crashed attempt's appended artifacts look like earlier corpus docs
    * and the retry reports every batch doc as a duplicate of itself —
    * use [[recoverDelivery]] first in that case). */
  def ingest(batch: DataFrame, idCol: String, textCol: String,
             n: Int, k: Int, bands: Int, threshold: Double, ref: Ref): DataFrame =
    ingest(batch, idCol, textCol, n, k, bands, threshold, ref,
      delivery = java.util.UUID.randomUUID().toString)

  /** Ingest one batch: return every confirmed near-dup pair the batch
    * introduces — (old_id, new_id, jaccard) with `old_id` already indexed,
    * or the lower id for a within-batch pair — then fold the batch into
    * the index tagged with `delivery`. Identical candidate recall and
    * verification (signature agreement pre-filter + exact hashed-shingle
    * Jaccard) to the batch family in [[Dedup]]; results are materialized
    * BEFORE the append so a batch never proposes pairs against itself
    * through the index.
    *
    * REPLAY CONTRACT: every corpus probe EXCLUDES rows tagged with this
    * `delivery`, so a retried ingest with the SAME id returns the same
    * pairs byte-for-byte even when the first attempt's appends landed
    * (fully or torn) — the only residue is duplicate artifact rows for
    * that delivery, invisible to results (candidate `distinct()` + the
    * per-doc verification are set-semantics) and removable via
    * [[recoverDelivery]]. Ids must be stable across retries of one
    * delivery and unique across deliveries. */
  def ingest(batch: DataFrame, idCol: String, textCol: String,
             n: Int, k: Int, bands: Int, threshold: Double, ref: Ref,
             delivery: String): DataFrame =
    ingestImpl(batch, idCol, textCol, None, n, k, bands, threshold, ref, delivery)

  /** [[ingestScoped]] with a generated unique-per-call delivery id (same
    * retry caveat as the unscoped convenience overload). */
  def ingestScoped(batch: DataFrame, idCol: String, textCol: String,
                   scopeCol: String, n: Int, k: Int, bands: Int,
                   threshold: Double, ref: Ref): DataFrame =
    ingestScoped(batch, idCol, textCol, scopeCol, n, k, bands, threshold, ref,
      delivery = java.util.UUID.randomUUID().toString)

  /** SCOPED [[ingest]] — the persistent-index face of the FineWeb
    * per-dump discipline ([[Dedup.minhashDupPairsScoped]]'s deployment
    * shape): pairs are reported only between docs whose `scopeCol`
    * values are EQUAL, so each scope (crawl snapshot, dump, tenant)
    * dedups against its own history and never against another's.
    *
    * The scope rides the banding the same way the batch operator's
    * does — folded into the 64-bit bucket HASH — so the three corpus
    * tables keep their exact (band, bucket) / (doc) bucketing and every
    * corpus probe stays exchange-free; the `scope` column itself is
    * carried through sigs/sh and enforced as an EQUALITY FILTER on the
    * candidate-sized frames after the per-doc signature lookups (a
    * cross-scope 64-bit bucket collision is killed there, and the
    * filter never widens a corpus join key). Within one index, every
    * ingest must be scoped (or every one unscoped) — mixing is refused
    * at attach time, because unscoped rows carry no scope to compare.
    *
    * Output: (old_id, new_id, scope, jaccard) — orientation and the
    * replay/lease/fsck contracts identical to [[ingest]]. */
  def ingestScoped(batch: DataFrame, idCol: String, textCol: String,
                   scopeCol: String, n: Int, k: Int, bands: Int,
                   threshold: Double, ref: Ref, delivery: String): DataFrame =
    ingestImpl(batch, idCol, textCol, Some(scopeCol), n, k, bands, threshold,
      ref, delivery)

  private def ingestImpl(batch: DataFrame, idCol: String, textCol: String,
                         scopeCol: Option[String], n: Int, k: Int, bands: Int,
                         threshold: Double, ref: Ref,
                         delivery: String): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    require(delivery.nonEmpty && delivery != LegacyDelivery,
      s"delivery id must be non-empty and not '$LegacyDelivery'")
    val r = k / bands
    val spark = batch.sparkSession
    withLease(spark, ref, "ingest") {
    val exists = attachForWrite(spark, ref)
    if (exists) {
      val hasScope = spark.table(ref.sigsTable).columns.contains("scope")
      require(hasScope == scopeCol.isDefined,
        s"index '${ref.tag}' was created ${if (hasScope) "SCOPED" else "UNSCOPED"} " +
          s"— every ingest must match (unscoped rows carry no scope to compare)")
    }
    def corpus(tbl: String): DataFrame =
      spark.table(tbl).filter(col("delivery") =!= lit(delivery))
    val scoped = scopeCol.isDefined
    val keyCols: Seq[Column] = col(idCol).as("doc") +:
      scopeCol.map(c => col(c).as("scope")).toSeq
    val sh = batch.select(keyCols :+
      Hashes.shingleHashCol(col(textCol), n).as("shs"): _*).cache()
    val carry: Seq[Column] = col("doc") +: (if (scoped) Seq(col("scope")) else Nil)
    val sigs = sh.select(carry :+
      Hashes.minhashFromHashes(col("shs"), k).as("sig"): _*).cache()
    // banding: scope (when present) is folded into the bucket hash — the
    // ONE banding definition of Dedup.bandedBuckets extended with the
    // same scope device as Dedup.minhashDupPairsScoped, so same-scope
    // docs collide as usual and cross-scope docs collide only on a
    // 64-bit hash accident (killed by the equality filter below)
    val banded =
      if (!scoped) Dedup.bandedBuckets(sigs, bands, r)
      else Dedup.scopedBandedBuckets(sigs, bands, r)

    // signature-agreement pre-filter + (scoped) the scope equality check,
    // both on the CANDIDATE-sized frame: the corpus-side lookup joins
    // stay keyed on doc alone (bucketed — zero corpus exchange), and the
    // scope filter never becomes a corpus join key
    def prefiltered(cands: DataFrame, oldSigs: DataFrame, bOld: Boolean): DataFrame = {
      val oldSel: Seq[Column] = Seq(col("doc").as("old_id"), col("sig").as("sig1")) ++
        (if (scoped) Seq(col("scope").as("_scope1")) else Nil)
      val newSel: Seq[Column] = Seq(col("doc").as("new_id"), col("sig").as("sig2")) ++
        (if (scoped) Seq(col("scope").as("scope")) else Nil)
      val joined = cands.distinct()
        .join({ val t = oldSigs.select(oldSel: _*)
                if (bOld) broadcast(t) else t }, "old_id")
        .join(broadcast(sigs.select(newSel: _*)), "new_id")
      val scopeOk = if (scoped) joined.filter(col("_scope1") === col("scope"))
        else joined
      scopeOk.filter(Dedup.sigAgreement(col("sig1"), col("sig2")) >= threshold - 0.25)
        .select(col("old_id") +: col("new_id") +:
          (if (scoped) Seq(col("scope")) else Nil): _*)
    }
    // carry scope through the one shared verify formula by re-attaching
    // it afterwards from the CACHED batch sigs (new_id is always a batch
    // doc, and the scope filter above guarantees both ends agree) — never
    // by re-evaluating the candidate frame, whose cross form scans corpus
    def verified(cands: DataFrame, shOld: DataFrame, bOld: Boolean): DataFrame = {
      val v = Dedup.verifyJaccard(cands.select("old_id", "new_id"), shOld, sh,
        "old_id", "new_id", threshold, broadcastLeft = bOld, broadcastRight = true)
      if (!scoped) v
      else v.join(broadcast(sigs.select(col("doc").as("new_id"), col("scope"))),
        Seq("new_id"))
    }

    // within-batch: self-banding, all lookups broadcast (a batch is small)
    val within = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("old_id"), col("b.doc").as("new_id"))
    val withinV = verified(prefiltered(within, sigs, bOld = true),
      sh, bOld = true)

    // batch-vs-corpus: the index side of every join is a bucketed scan on
    // its join key — no exchange, no broadcast of corpus-sized tables
    val all = if (!exists) withinV else {
      val cross = corpus(ref.bandedTable).as("i").join(banded.as("b"),
          col("i.band") === col("b.band") && col("i.bucket") === col("b.bucket"))
        .select(col("i.doc").as("old_id"), col("b.doc").as("new_id"))
      val crossV = verified(
        prefiltered(cross, corpus(ref.sigsTable), bOld = false),
        corpus(ref.shTable), bOld = false)
      withinV.unionByName(crossV)
    }
    // distinct = set semantics on the RESULT (batch-sized, not corpus):
    // legitimate pairs are unique already (banded candidates dedup), so
    // this only cancels echoes of duplicate artifact rows a crashed+
    // retried EARLIER delivery left at rest — later ingests stay exact
    // without ever shuffling the corpus side
    val out = all.distinct().localCheckpoint() // materialize before the index grows
    // the three artifact appends are independent tables — submit them as
    // CONCURRENT Spark jobs (hashing is already computed and cached, so
    // the jobs are write-bound and overlap cleanly; measured: the
    // sequential form paid the three write latencies end to end)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val appends = ref.layout.zip(Seq(banded, sigs, sh)).map { case ((tbl, cols), df) =>
      scala.concurrent.Future(appendBucketed(
        df.withColumn("delivery", lit(delivery)), tbl, ref.buckets, cols))
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(appends),
      scala.concurrent.duration.Duration.Inf)
    sh.unpersist(); sigs.unpersist()
    out
    }
  }

  /** Retract one delivery's artifact rows from all three tables — the
    * mechanical recovery for a crashed batch ingest whose retry cannot
    * re-use the original delivery id (or whose content should not land
    * at all). After it, a fresh ingest of the same content under ANY id
    * behaves as if the crashed attempt never ran. Same rename-aside
    * rewrite as [[compact]], under the write lease. */
  def recoverDelivery(spark: SparkSession, ref: Ref, delivery: String): Unit =
    withLease(spark, ref, "recoverDelivery") {
      require(delivery != LegacyDelivery,
        s"cannot retract '$LegacyDelivery' — pre-migration lineage is collapsed")
      if (attachForWrite(spark, ref)) ref.layout.foreach { case (tbl, cols) =>
        compactOne(spark, ref, tbl, cols,
          _.filter(col("delivery") =!= lit(delivery)))
      }
    }

  /** The stable delivery id a stream's micro-batch `bid` ingests under —
    * what makes a replayed batch self-exclude. Batch callers of [[ingest]]
    * sharing the index must avoid the `stream:` prefix. */
  def streamDelivery(bid: Long): String = s"stream:$bid"

  /** Compact the index: every [[ingest]] appends one file per bucket, so
    * a long-lived index accumulates smallFiles × buckets — re-write each
    * table once, same bucketing, one file per bucket. Content-preserving
    * (spec-pinned) and bucket-local at scale: rows never cross buckets,
    * so a real deployment compacts buckets independently (concat-style)
    * — this whole-table rewrite is the simple form of that maintenance
    * window. Runs under the same exclusive write lease as [[ingest]]
    * (a racing ingest fails fast instead of losing its appends), and is
    * crash-durable: the compacted copy lands on storage as a `_compacting`
    * sibling BEFORE the live table is touched, and the swap is
    * RENAME-ASIDE — live files rename to an `_old` sibling, the copy
    * renames in, `_old` deletes last — so live data is never deleted
    * before its replacement is in place. A crash anywhere leaves at
    * least one complete copy on storage; re-running compact performs
    * the recovery (rename `_old` back, re-register the catalog entry)
    * in its preamble. */
  def compact(spark: SparkSession, ref: Ref): Unit =
    withLease(spark, ref, "compact") {
      // three independent tables — compact them as concurrent jobs (same
      // parallelism argument as the ingest appends; DDL targets are
      // distinct catalog entries)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      val jobs = ref.layout.map { case (tbl, cols) =>
        scala.concurrent.Future { compactOne(spark, ref, tbl, cols) }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(jobs),
        scala.concurrent.duration.Duration.Inf); ()
    }

  private def compactOne(spark: SparkSession, ref: Ref, tbl: String,
                         cols: Seq[String],
                         transform: DataFrame => DataFrame = identity): Unit = {
        val tmp = s"${tbl}_compacting"
        val tmpLoc = location(spark, tmp)
        val loc = location(spark, tbl)
        val oldLoc = location(spark, s"${tbl}_old")
        val f = hfs(spark, tmpLoc)
        // recovery from a compact that died mid-swap: live files may sit
        // aside under _old, and the catalog entry may be dropped
        if (!f.exists(loc) && f.exists(oldLoc)) mustRename(f, oldLoc, loc)
        if (!spark.catalog.tableExists(tbl)) register(spark, ref, tbl, cols)
        // durable compacted copy first — the live table is not yet touched
        spark.sql(s"DROP TABLE IF EXISTS $tmp")
        f.delete(tmpLoc, true)
        // the localCheckpoint is NOT for durability (the tmp table is the
        // durable copy) — it breaks the scan's logical bucket-partitioning
        // so the repartition actually shuffles: Catalyst otherwise elides
        // it as redundant, then plans an unbucketed scan whose raw file
        // splits misalign with bucket ids and fan out file-per-task-bucket
        val newRows = transform(spark.table(tbl).localCheckpoint(true))
          .repartition(ref.buckets, cols.map(col): _*)
        // re-register under the TRANSFORMED schema — a schema-changing
        // transform (the legacy-index migration) must not re-attach the
        // files under the pre-transform DDL
        val schemaDdl = newRows.schema.toDDL
        appendBucketed(newRows, tmp, ref.buckets, cols)
        // swap: drop the catalog entries, rename live ASIDE (never
        // deleted before its replacement is in place), rename the copy
        // in, re-assert the bucketing DDL, delete the aside copy LAST
        spark.sql(s"DROP TABLE $tbl")
        spark.sql(s"DROP TABLE $tmp") // catalog entry only; files stay
        f.delete(oldLoc, true)
        mustRename(f, loc, oldLoc)
        mustRename(f, tmpLoc, loc)
        register(spark, ref, tbl, cols, Some(schemaDdl))
        f.delete(oldLoc, true); ()
  }

  /** Maintain the index from a document STREAM — the cross-run flavor of
    * the in-state claim index (streaming/StreamingDedup.scala): each
    * micro-batch runs [[ingest]] inside foreachBatch, so within-batch and
    * batch-vs-corpus pairs come from the ONE batch definition, and the
    * corpus index survives restarts on disk (re-[[attach]] in a fresh
    * process) instead of living in the state store.
    *
    * Replay discipline: pairs land in `outDir/pairs/batch_id=<id>` with
    * per-batch OVERWRITE (a replayed batch rewrites its own partition),
    * and a `_ledger` records completed batch ids (watermark-compacted:
    * [[graft.streaming.IngestLedger]] folds the sequential ids into a
    * generation, so the per-commit done-check lists O(1) files in
    * stream age, not O(batches)) — a replayed, already-ledgered batch
    * is skipped whole. A crash BETWEEN the index
    * append and the ledger write re-ingests that batch on restart under
    * its stable delivery id ([[streamDelivery]]): the corpus probes
    * self-exclude the crashed attempt's rows, so the replayed pair set is
    * byte-identical to an uncrashed run and the per-batch partition
    * overwrites; the only residue is duplicate artifact rows for that
    * delivery (storage, not correctness — [[recoverDelivery]] retracts
    * them). The `old_id =!= new_id` guard stays as defense-in-depth for
    * callers who violate the id-uniqueness contract. */
  def startStreamingIngest(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, k: Int, bands: Int, threshold: Double,
                           ref: Ref, outDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
        val spark = batch.sparkSession
        val ledger = s"$outDir/_ledger"
        if (!graft.streaming.IngestLedger.isDone(spark, ledger, bid)) {
          ingest(batch.toDF(), idCol, textCol, n, k, bands, threshold, ref,
              delivery = streamDelivery(bid))
            .filter(col("old_id") =!= col("new_id")) // id-contract-violation guard
            .write.mode("overwrite")
            .parquet(s"$outDir/pairs/batch_id=$bid")
          graft.streaming.IngestLedger.markDone(spark, ledger, bid)
        }
        ()
      }
      .start()
}
