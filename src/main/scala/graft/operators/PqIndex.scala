package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-RUN persistent IVFADC index — the compressed-ANN completion of
  * the persistent-index family ([[LshIndex]] near-dup, [[IvfIndex]]
  * raw-vector ANN): the on-disk form of [[PQ.ivfAdcTopK]]'s IVF + product
  * -quantization search (Jégou, Douze & Schmid 2011, non-residual
  * variant), with every model artifact frozen on storage so searches and
  * ingests in any later process pay neither re-fit nor re-encode.
  *
  *  - `coarse/`    (cell_id, cvec) — the coarse quantizer's centroids
  *    (scaled-integer, [[ML.kMeansScaled]] output), broadcast-tiny.
  *  - `codebooks/` (m, cell_id, cvec) — the m per-subspace PQ codebooks
  *    ([[PQ.fit]] output), broadcast-tiny.
  *  - `codes/`     (id, m, cell_id) PARTITIONED BY ivf_cell — the corpus
  *    as PQ CODES laid out cell-per-directory: a search reading `nProbe`
  *    of `nCells` cells scans that fraction of the files (partition
  *    pruning, spec-pinned), and each vector is m small ints instead of
  *    the float vector — the IVF promise times the 64× PQ compression,
  *    which is what makes the scan side viable at 100 TB.
  *
  * [[build]] fits both quantizers deterministically over the build corpus
  * (the scaled-integer devices, so results replay in SQL) and persists
  * them; [[ingest]] assigns + encodes new vectors against the FROZEN
  * models — byte-identical to what the build-time encode would have
  * produced (the fit's final assignment step IS assignment against the
  * final centroids, spec-pinned) — and appends their cells. O(|batch| ·
  * (nCells + m·k)) work, zero corpus contact. Vector ids must be unique
  * across the index's lifetime. */
object PqIndex {

  final case class Ref(tag: String) {
    def dirName: String = s"graft_pqidx_$tag"
  }

  private def root(spark: SparkSession, ref: Ref): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), ref.dirName)
  private def fs(spark: SparkSession, ref: Ref): org.apache.hadoop.fs.FileSystem =
    root(spark, ref).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def sub(spark: SparkSession, ref: Ref, name: String): String =
    new org.apache.hadoop.fs.Path(root(spark, ref), name).toString

  /** Destroy the index files (lease included). */
  def drop(spark: SparkSession, ref: Ref): Unit = {
    fs(spark, ref).delete(root(spark, ref), true)
    breakLease(spark, ref)
  }

  // single-writer contract, enforced like LshIndex/IvfIndex: ingest and
  // compact both mutate the cell directories; writers take an exclusive
  // on-storage lease, a second writer fails fast with the holder's tag,
  // and a crashed writer's lingering lease is broken explicitly.
  // Storage assumption as LshIndex.withLease documents: atomic
  // create-if-absent holds on HDFS/local but NOT on object stores (no
  // atomic exclusive create on s3a) — there, use a store-side primitive.
  private def leasePath(spark: SparkSession, ref: Ref): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"${ref.dirName}_lease")

  // rename reports failure as `false`; a silently-failed swap step voids
  // the crash-durability contract (see LshIndex.mustRename)
  private def mustRename(f: org.apache.hadoop.fs.FileSystem,
                         src: org.apache.hadoop.fs.Path,
                         dst: org.apache.hadoop.fs.Path): Unit =
    require(f.rename(src, dst), s"rename $src -> $dst failed")

  private def withLease[T](spark: SparkSession, ref: Ref, who: String)(body: => T): T = {
    val p = leasePath(spark, ref)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
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
            s"breakLease after confirming it is dead")
    }
    try {
      out.write(who.getBytes(java.nio.charset.StandardCharsets.UTF_8)); out.close()
      body
    } finally { f.delete(p, false); () }
  }

  /** Remove a crashed writer's lingering lease. ONLY safe once the
    * operator has confirmed no ingest/compact is live. */
  def breakLease(spark: SparkSession, ref: Ref): Unit = {
    val p = leasePath(spark, ref)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false); ()
  }

  def coarseCentroids(spark: SparkSession, ref: Ref): DataFrame =
    spark.read.parquet(sub(spark, ref, "coarse"))
  def codebooks(spark: SparkSession, ref: Ref): DataFrame =
    spark.read.parquet(sub(spark, ref, "codebooks"))

  private def scaled(vec: org.apache.spark.sql.Column, scale: Long) =
    transform(vec, x => floor(x.cast("double") * scale).cast("long"))

  private def l2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** Fit-and-persist ONLY the model artifacts — deterministic coarse
    * k-means (`nCells`, `cIters` rounds) + per-subspace PQ codebooks
    * (`m` subspaces of `dim`, `k` cells, `iters` rounds) over `fitSet` —
    * WITHOUT ingesting: the deployment shape where quantizers are fit
    * once (often on a sample) and the corpus arrives later through
    * [[ingest]] / [[startStreamingIngest]] against the frozen models. */
  def buildModels(fitSet: DataFrame, idCol: String, vecCol: String, dim: Int,
                  m: Int, k: Int, iters: Int, nCells: Int, cIters: Int,
                  ref: Ref, scale: Long = 1000000L): Unit = {
    val spark = fitSet.sparkSession
    val coarse = ML.kMeansScaled(fitSet, idCol, vecCol, nCells, cIters, scale)
    coarse.centroids.write.mode("overwrite").parquet(sub(spark, ref, "coarse"))
    val pq = PQ.fit(fitSet, idCol, vecCol, dim, m, k, iters, scale)
    pq.centroids.write.mode("overwrite").parquet(sub(spark, ref, "codebooks"))
  }

  /** Fit-and-load: [[buildModels]] over the corpus, then the corpus
    * itself [[ingest]]ed against the frozen artifacts. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, dim: Int, m: Int,
            k: Int, iters: Int, nCells: Int, cIters: Int, ref: Ref,
            scale: Long = 1000000L): Unit = {
    buildModels(corpus, idCol, vecCol, dim, m, k, iters, nCells, cIters, ref, scale)
    ingest(corpus, idCol, vecCol, dim, m, ref, scale)
  }

  /** Assign a batch to the frozen coarse centroids and encode it against
    * the frozen codebooks (both argmin integer L2, ties to the lower cell
    * — exactly [[ML.kMeansScaled]]'s assignment step, as the map-side
    * min(struct) aggregate), then append cell-per-directory.
    *
    * RETRY CONTRACT: a crashed ingest is safely re-run AS IS — the
    * frozen-model encoding is deterministic, so a replay appends
    * byte-identical rows whose duplicates are invisible to search
    * (per-query rank dedups them; spec-pinned) and removed at rest by
    * [[compact]]. No delivery bookkeeping is needed because ingest
    * returns nothing a replay could change. */
  def ingest(batch: DataFrame, idCol: String, vecCol: String, dim: Int, m: Int,
             ref: Ref, scale: Long = 1000000L): Unit = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val spark = batch.sparkSession
    withLease(spark, ref, "ingest") {
    val subLen = dim / m
    val q = batch.select(col(idCol).as("id"), scaled(col(vecCol), scale).as("qv"))
    val assigned = q.crossJoin(broadcast(coarseCentroids(spark, ref)))
      .withColumn("dist", l2(col("qv"), col("cvec")))
      .groupBy(col("id"))
      .agg(min(struct(col("dist"), col("cell_id"), col("qv"))).as("a"))
      .select(col("id"), col("a.qv").as("qv"), col("a.cell_id").as("ivf_cell"))
    assigned
      .select(col("id"), col("ivf_cell"),
        posexplode(array((0 until m).map(mi =>
          slice(col("qv"), mi * subLen + 1, subLen)): _*)).as(Seq("m", "pv")))
      .join(broadcast(codebooks(spark, ref)), Seq("m"))
      .withColumn("dist", l2(col("pv"), col("cvec")))
      .groupBy(col("id"), col("ivf_cell"), col("m"))
      .agg(min(struct(col("dist"), col("cell_id"))).as("c"))
      .select(col("id"), col("m"), col("c.cell_id").as("cell_id"), col("ivf_cell"))
      .write.mode("append").partitionBy("ivf_cell")
      .parquet(sub(spark, ref, "codes"))
    }
  }

  /** Compact the code-cell directories — the [[IvfIndex.compact]]
    * maintenance for the coded corpus: one file per cell after, content
    * preserved minus crash-window duplicate rows (the (ivf_cell, id, m)
    * de-dup applied once at rest), single-writer. Crash-durable via a
    * rename-aside swap: the live directory is NEVER deleted before the
    * compacted copy is in place — live renames to `codes_old`, the copy
    * renames in, `codes_old` deletes last. A crash between the two
    * renames leaves no live directory but BOTH complete copies on
    * storage; the recovery preamble here (or a manual
    * `codes_old` → `codes` rename) restores service. */
  def compact(spark: SparkSession, ref: Ref): Unit = withLease(spark, ref, "compact") {
    val live = new org.apache.hadoop.fs.Path(root(spark, ref), "codes")
    val tmp = new org.apache.hadoop.fs.Path(root(spark, ref), "codes_compacting")
    val old = new org.apache.hadoop.fs.Path(root(spark, ref), "codes_old")
    val f = fs(spark, ref)
    // recovery: a compact that died between its two renames left the
    // complete live copy aside — put it back before proceeding
    if (!f.exists(live) && f.exists(old)) mustRename(f, old, live)
    f.delete(old, true)
    f.delete(tmp, true)
    val snapshot = spark.read.parquet(live.toString).localCheckpoint(true)
    val nCells = coarseCentroids(spark, ref).count().toInt
    snapshot.dropDuplicates("ivf_cell", "id", "m")
      .repartition(nCells, col("ivf_cell"))
      .write.partitionBy("ivf_cell").parquet(tmp.toString)
    mustRename(f, live, old)
    mustRename(f, tmp, live)
    f.delete(old, true); ()
  }

  /** Maintain the index from an embedding STREAM: each micro-batch runs
    * [[ingest]] against the frozen coarse centroids + codebooks inside
    * foreachBatch — same ledgered replay discipline as
    * [[IvfIndex.startStreamingIngest]] (a `_ledger` parquet records
    * completed batch ids; an already-ledgered replayed batch is skipped
    * whole; the crash-between-append-and-ledger window duplicates one
    * batch's code rows — storage only, [[search]] de-dups
    * (ivf_cell, id, m) on the pruned scan). */
  def startStreamingIngest(vectors: DataFrame, idCol: String, vecCol: String,
                           dim: Int, m: Int, ref: Ref, checkpoint: String,
                           scale: Long = 1000000L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val ledger = s"${root(spark, ref)}/_ledger"
        if (!graft.streaming.IngestLedger.isDone(spark, ledger, bid)) {
          ingest(batch.toDF(), idCol, vecCol, dim, m, ref, scale)
          graft.streaming.IngestLedger.markDone(spark, ledger, bid)
        }
        ()
      }
      .start()

  /** IVFADC search from the on-disk index: identical result semantics to
    * [[PQ.ivfAdcTopK]] over the same fits (spec-pinned byte-equal) —
    * coarse-rank `nProbe` cells per probe against the broadcast frozen
    * centroids, scan ONLY those cells' code directories (partition
    * pruning over the nQueries·nProbe-bounded probed-cell set), rank by
    * the broadcast ADC lookup table. De-dups (ivf_cell, id, m) on the
    * pruned scan so crash-window replayed ingest batches cannot distort
    * distances or ranks. Returns (q_id, rank, id, adc_dist). */
  def search(probes: DataFrame, idCol: String, vecCol: String, dim: Int, m: Int,
             nProbe: Int, topK: Int, ref: Ref,
             scale: Long = 1000000L): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    import org.apache.spark.sql.expressions.Window
    val spark = probes.sparkSession
    val subLen = dim / m
    val qp = probes.select(col(idCol).as("q_id"), scaled(col(vecCol), scale).as("qv"))
      .localCheckpoint(true) // consumed by routing AND the LUT
    val pw = Window.partitionBy("q_id").orderBy(col("cdist").asc, col("cell_id"))
    val probeCells = qp.crossJoin(broadcast(coarseCentroids(spark, ref)))
      .withColumn("cdist", l2(col("qv"), col("cvec")))
      .withColumn("r", row_number().over(pw)).filter(col("r") <= nProbe)
      .select(col("q_id"), col("cell_id").as("ivf_cell"))
      .localCheckpoint(true) // consumed by the cell collect AND the route join
    val probed = probeCells.select("ivf_cell").distinct()
      .collect().map(_.get(0)) // nQueries·nProbe-bounded; untyped id domain
    val codes = spark.read.parquet(sub(spark, ref, "codes"))
      .filter(col("ivf_cell").isin(probed: _*)) // partition pruning
      .dropDuplicates("ivf_cell", "id", "m") // crash-window replay guard
    val lut = qp.select(col("q_id"),
        posexplode(array((0 until m).map(mi =>
          slice(col("qv"), mi * subLen + 1, subLen)): _*)).as(Seq("m", "pv")))
      .join(broadcast(codebooks(spark, ref)), Seq("m"))
      .select(col("q_id"), col("m"), col("cell_id"),
        l2(col("pv"), col("cvec")).as("pdist"))
    val routed = probeCells.join(broadcast(lut), Seq("q_id"))
    val adc = codes.join(broadcast(routed), Seq("ivf_cell", "m", "cell_id"))
      .groupBy(col("q_id"), col("id"))
      .agg(sum(col("pdist")).as("adc_dist"))
    val w = Window.partitionBy("q_id").orderBy(col("adc_dist").asc, col("id").asc)
    adc.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("id"), col("adc_dist"))
  }
}
