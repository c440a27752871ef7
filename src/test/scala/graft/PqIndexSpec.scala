package graft

import graft.operators.{ML, PQ, PqIndex}
import org.apache.spark.sql.functions._

/** Persistent IVFADC index (operators/PqIndex.scala): byte-equality with
  * the in-memory PQ.ivfAdcTopK over the same deterministic fits,
  * batch-split invariance of frozen-model ingest, crash-window duplicate
  * immunity, and the cell-directory pruning plan. */
class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val m = 4

  private def vecs(ids: Seq[Long]) = ids.map { i =>
    val base = if (i % 2 == 0) 1.0f else -1.0f
    (i, Array.tabulate(dim)(d => base + ((i * 31 + d * 7) % 13).toFloat / 100f))
  }.toDF("vec_id", "embedding")

  private def res(ref: PqIndex.Ref, queries: org.apache.spark.sql.DataFrame) =
    PqIndex.search(queries, "vec_id", "embedding", dim, m, nProbe = 2,
        topK = 5, ref)
      .select($"q_id", $"rank", $"id", $"adc_dist")
      .as[(Long, Int, Long, Long)].collect().toSet

  test("search over a full-corpus build is byte-equal to in-memory ivfAdcTopK") {
    val ref = PqIndex.Ref("spec")
    PqIndex.drop(spark, ref)
    val corpus = vecs(0L until 60L)
    PqIndex.build(corpus, "vec_id", "embedding", dim, m, k = 4, iters = 1,
      nCells = 4, cIters = 1, ref)
    val queries = corpus.filter($"vec_id" < 3)
    val got = res(ref, queries)
    val coarse = ML.kMeansScaled(corpus, "vec_id", "embedding", k = 4, iters = 1)
    val model = PQ.fit(corpus, "vec_id", "embedding", dim, m, k = 4, iters = 1)
    val want = PQ.ivfAdcTopK(coarse, model, queries, "vec_id", "embedding",
        dim, m, nProbe = 2, topK = 5)
      .select($"q_id", $"rank", $"id", $"adc_dist")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
    PqIndex.drop(spark, ref)
  }

  test("frozen-model ingest is batch-split invariant, and replayed " +
    "batches cannot distort results") {
    // both indexes fit models on the SAME build slice (all centroid seeds
    // live there), then the arrivals land as one batch vs two
    val build = vecs(0L until 40L)
    val one = PqIndex.Ref("specone"); PqIndex.drop(spark, one)
    PqIndex.build(build, "vec_id", "embedding", dim, m, k = 4, iters = 1,
      nCells = 4, cIters = 1, one)
    PqIndex.ingest(vecs(40L until 60L), "vec_id", "embedding", dim, m, one)
    val two = PqIndex.Ref("spectwo"); PqIndex.drop(spark, two)
    PqIndex.build(build, "vec_id", "embedding", dim, m, k = 4, iters = 1,
      nCells = 4, cIters = 1, two)
    PqIndex.ingest(vecs(40L until 50L), "vec_id", "embedding", dim, m, two)
    PqIndex.ingest(vecs(50L until 60L), "vec_id", "embedding", dim, m, two)
    val queries = build.filter($"vec_id" < 3)
    val a = res(one, queries)
    assert(a === res(two, queries) && a.nonEmpty)
    // crash-window replay: re-ingest an already-indexed slice; the
    // (ivf_cell, id, m) de-dup must keep distances AND ranks unchanged
    PqIndex.ingest(vecs(40L until 50L), "vec_id", "embedding", dim, m, one)
    assert(res(one, queries) === a)
    PqIndex.drop(spark, one); PqIndex.drop(spark, two)
  }

  test("streaming ingest: batches encode against the frozen models, " +
    "restart is a ledgered no-op") {
    val ref = PqIndex.Ref("specstream"); PqIndex.drop(spark, ref)
    val build = vecs(0L until 40L)
    PqIndex.build(build, "vec_id", "embedding", dim, m, k = 4, iters = 1,
      nCells = 4, cIters = 1, ref)
    val base = java.nio.file.Files.createTempDirectory("pqidx_stream").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    Seq(40L until 50L, 50L until 60L).zipWithIndex.foreach { case (r, i) =>
      vecs(r).coalesce(1).write.parquet(s"$src/slice$i"); Thread.sleep(20)
    }
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    def start() = PqIndex.startStreamingIngest(
      spark.readStream.schema(build.schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$src/slice*"),
      "vec_id", "embedding", dim, m, ref, ckpt)
    val q = start(); try q.processAllAvailable() finally q.stop()
    // streamed == batch build+ingest over the same data (frozen models)
    val batchRef = PqIndex.Ref("specstreamb"); PqIndex.drop(spark, batchRef)
    PqIndex.build(build, "vec_id", "embedding", dim, m, k = 4, iters = 1,
      nCells = 4, cIters = 1, batchRef)
    PqIndex.ingest(vecs(40L until 60L), "vec_id", "embedding", dim, m, batchRef)
    val queries = build.filter($"vec_id" < 3)
    assert(res(ref, queries) === res(batchRef, queries))
    // restart over the same source + checkpoint: ledger blocks re-ingest
    def codeRows() = spark.read.parquet(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      s"${ref.dirName}/codes").getAbsolutePath).count()
    val rows = codeRows()
    val q2 = start(); try q2.processAllAvailable() finally q2.stop()
    assert(codeRows() === rows)
    PqIndex.drop(spark, ref); PqIndex.drop(spark, batchRef)
    org.apache.commons.io.FileUtils.deleteQuietly(base)
  }

  test("compact: one file per code cell, duplicates collapsed, search unchanged") {
    val ref = PqIndex.Ref("speccompact")
    PqIndex.drop(spark, ref)
    PqIndex.build(vecs(0L until 40L), "vec_id", "embedding", dim, m, k = 4,
      iters = 1, nCells = 4, cIters = 1, ref)
    PqIndex.ingest(vecs(40L until 60L), "vec_id", "embedding", dim, m, ref)
    PqIndex.ingest(vecs(10L until 20L), "vec_id", "embedding", dim, m, ref) // replay
    val queries = vecs(0L until 3L)
    val before = res(ref, queries)
    val codes = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), s"${ref.dirName}/codes")
    def cellFiles() = codes.listFiles().filter(_.getName.startsWith("ivf_cell="))
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(cellFiles().exists(_ > 1), "multi-ingest must leave multiple files")
    PqIndex.compact(spark, ref)
    assert(cellFiles().forall(_ === 1), s"per-cell files: ${cellFiles().toSeq}")
    val rows = spark.read.parquet(codes.getAbsolutePath)
    assert(rows.count() === rows.dropDuplicates("ivf_cell", "id", "m").count())
    assert(res(ref, queries) === before)
    PqIndex.drop(spark, ref)
  }

  test("compact recovers a crash between its two swap renames") {
    val ref = PqIndex.Ref("specrecover")
    PqIndex.drop(spark, ref)
    PqIndex.build(vecs(0L until 40L), "vec_id", "embedding", dim, m, k = 4,
      iters = 1, nCells = 4, cIters = 1, ref)
    val queries = vecs(0L until 3L)
    val before = res(ref, queries)
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val codes = new java.io.File(wh, s"${ref.dirName}/codes")
    val old = new java.io.File(wh, s"${ref.dirName}/codes_old")
    assert(codes.renameTo(old), "simulated crash rename failed")
    PqIndex.compact(spark, ref)
    assert(codes.exists && !old.exists)
    assert(res(ref, queries) === before)
    PqIndex.drop(spark, ref)
  }

  test("write lease: a second writer fails fast; breakLease restores access") {
    val ref = PqIndex.Ref("speclease")
    PqIndex.drop(spark, ref)
    PqIndex.build(vecs(0L until 40L), "vec_id", "embedding", dim, m, k = 4,
      iters = 1, nCells = 4, cIters = 1, ref)
    val lease = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), s"${ref.dirName}_lease")
    java.nio.file.Files.write(lease.toPath,
      "crashed-writer".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalStateException] {
      PqIndex.ingest(vecs(40L until 50L), "vec_id", "embedding", dim, m, ref)
    }
    assert(e.getMessage.contains("crashed-writer"))
    assert(intercept[IllegalStateException] {
      PqIndex.compact(spark, ref)
    }.getMessage.contains("crashed-writer"))
    PqIndex.breakLease(spark, ref)
    PqIndex.ingest(vecs(40L until 50L), "vec_id", "embedding", dim, m, ref)
    assert(!lease.exists(), "lease must release when the writer completes")
    PqIndex.drop(spark, ref)
  }

  test("search prunes to the probed cells' code directories") {
    val ref = PqIndex.Ref("specprune")
    PqIndex.drop(spark, ref)
    PqIndex.build(vecs(0L until 60L), "vec_id", "embedding", dim, m, k = 4,
      iters = 1, nCells = 4, cIters = 1, ref)
    val out = PqIndex.search(vecs(Seq(0L)), "vec_id", "embedding", dim, m,
      nProbe = 1, topK = 3, ref)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      "PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      s"probed-cell filter must prune partitions:\n$plan")
    assert(out.count() === 3)
    PqIndex.drop(spark, ref)
  }
}
