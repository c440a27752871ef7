package graft

import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._

/** Persistent IVF index (operators/IvfIndex.scala): equivalence with the
  * in-memory ivfTopK, build+ingest == build-on-union under a shared
  * centroid seed, and the cell-per-directory pruning plan. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  // deterministic 8-dim vectors on a couple of noisy clusters
  private def vecs(ids: Seq[Long]) = ids.map { i =>
    val base = if (i % 2 == 0) 1.0f else -1.0f
    (i, Array.tabulate(8)(d => base + ((i * 31 + d * 7) % 13).toFloat / 100f))
  }.toDF("vec_id", "embedding")

  test("search over a full-corpus build equals in-memory ivfTopK") {
    val ref = IvfIndex.Ref("spec")
    IvfIndex.drop(spark, ref)
    val corpus = vecs(0L until 60L)
    IvfIndex.build(corpus, "vec_id", "embedding", nCells = 4, ref)
    val queries = corpus.filter($"vec_id" < 3)
    val got = IvfIndex.search(queries, "vec_id", "embedding", ref, k = 5, nProbe = 2)
      .select($"query_id", $"rank", $"nbr_id").as[(Long, Int, Long)].collect().toSet
    val want = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
        "vec_id", k = 5, nCells = 4, nProbe = 2)
      .select($"query_id", $"rank", $"nbr_id").as[(Long, Int, Long)].collect().toSet
    assert(got === want)
    IvfIndex.drop(spark, ref)
  }

  test("build + ingest == build-on-union when the centroid seed is shared") {
    // the 4 lowest ids (the seed) all sit in the build slice, so both
    // paths freeze the SAME quantizer and only arrival time differs
    val build = vecs(0L until 40L)
    val arriving = vecs(40L until 60L)
    val queries = build.filter($"vec_id" < 3)
    val incr = IvfIndex.Ref("specincr"); IvfIndex.drop(spark, incr)
    IvfIndex.build(build, "vec_id", "embedding", nCells = 4, incr)
    IvfIndex.ingest(arriving, "vec_id", "embedding", incr)
    val full = IvfIndex.Ref("specfull"); IvfIndex.drop(spark, full)
    IvfIndex.build(vecs(0L until 60L), "vec_id", "embedding", nCells = 4, full)
    def res(r: IvfIndex.Ref) =
      IvfIndex.search(queries, "vec_id", "embedding", r, k = 5, nProbe = 2)
        .select($"query_id", $"rank", $"nbr_id", round($"cos", 6))
        .as[(Long, Int, Long, Double)].collect().toSet
    assert(res(incr) === res(full))
    IvfIndex.drop(spark, incr); IvfIndex.drop(spark, full)
  }

  test("streaming ingest: batches land against the frozen model, restart " +
    "is a ledgered no-op") {
    val ref = IvfIndex.Ref("specstream")
    IvfIndex.drop(spark, ref)
    val build = vecs(0L until 40L)
    IvfIndex.build(build, "vec_id", "embedding", nCells = 4, ref)
    val base = java.nio.file.Files.createTempDirectory("ivfidx_stream").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    Seq(40L until 50L, 50L until 60L).zipWithIndex.foreach { case (r, i) =>
      vecs(r).coalesce(1).write.parquet(s"$src/slice$i"); Thread.sleep(20)
    }
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    def start() = IvfIndex.startStreamingIngest(
      spark.readStream.schema(build.schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$src/slice*"),
      "vec_id", "embedding", ref, ckpt)
    val q = start(); try q.processAllAvailable() finally q.stop()
    // streamed index == batch build+ingest over the same data (seed shared)
    val batchRef = IvfIndex.Ref("specstreamb"); IvfIndex.drop(spark, batchRef)
    IvfIndex.build(build, "vec_id", "embedding", nCells = 4, batchRef)
    IvfIndex.ingest(vecs(40L until 60L), "vec_id", "embedding", batchRef)
    val queries = build.filter($"vec_id" < 3)
    def res(r: IvfIndex.Ref) =
      IvfIndex.search(queries, "vec_id", "embedding", r, k = 5, nProbe = 2)
        .select($"query_id", $"rank", $"nbr_id").as[(Long, Int, Long)].collect().toSet
    assert(res(ref) === res(batchRef))
    // restart over the same source + checkpoint: ledger blocks re-ingest
    val rows = spark.read.parquet(
      new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), s"${ref.dirName}/asg").getAbsolutePath).count()
    val q2 = start(); try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(
      new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), s"${ref.dirName}/asg").getAbsolutePath).count() === rows)
    IvfIndex.drop(spark, ref); IvfIndex.drop(spark, batchRef)
    org.apache.commons.io.FileUtils.deleteQuietly(base)
  }

  test("search is immune to crash-window duplicate index rows") {
    // a crash between the asg append and the ledger write replays a batch
    // whole — the index then carries exact duplicates of those rows; a
    // duplicated neighbor must not occupy two of the k ranks and evict a
    // genuine one
    val ref = IvfIndex.Ref("specdup")
    IvfIndex.drop(spark, ref)
    val corpus = vecs(0L until 60L)
    IvfIndex.build(corpus, "vec_id", "embedding", nCells = 4, ref)
    val queries = corpus.filter($"vec_id" < 3)
    def res() =
      IvfIndex.search(queries, "vec_id", "embedding", ref, k = 5, nProbe = 2)
        .select($"query_id", $"rank", $"nbr_id", round($"cos", 6))
        .as[(Long, Int, Long, Double)].collect().toSet
    val before = res()
    // the replay: re-ingest an already-indexed slice (same frozen
    // centroids => byte-identical duplicate rows in their cells)
    IvfIndex.ingest(vecs(10L until 30L), "vec_id", "embedding", ref)
    assert(res() === before,
      "top-k must be unchanged by duplicated index rows")
    IvfIndex.drop(spark, ref)
  }

  test("compact: one file per cell, duplicates collapsed, search unchanged") {
    val ref = IvfIndex.Ref("speccompact")
    IvfIndex.drop(spark, ref)
    IvfIndex.build(vecs(0L until 40L), "vec_id", "embedding", nCells = 4, ref)
    IvfIndex.ingest(vecs(40L until 50L), "vec_id", "embedding", ref)
    IvfIndex.ingest(vecs(50L until 60L), "vec_id", "embedding", ref)
    IvfIndex.ingest(vecs(10L until 20L), "vec_id", "embedding", ref) // replay
    val queries = vecs(0L until 3L)
    def res() = IvfIndex.search(queries, "vec_id", "embedding", ref,
        k = 5, nProbe = 2)
      .select($"query_id", $"rank", $"nbr_id", round($"cos", 6))
      .as[(Long, Int, Long, Double)].collect().toSet
    val before = res()
    val asg = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), s"${ref.dirName}/asg")
    def cellFiles() = asg.listFiles().filter(_.getName.startsWith("cell_id="))
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(cellFiles().exists(_ > 1), "multi-ingest must leave multiple files")
    IvfIndex.compact(spark, ref)
    assert(cellFiles().forall(_ === 1), s"per-cell files: ${cellFiles().toSeq}")
    // duplicates from the replayed batch are gone at rest
    val rows = spark.read.parquet(asg.getAbsolutePath)
    assert(rows.count() === rows.dropDuplicates("cell_id", "nbr_id").count())
    assert(res() === before)
    IvfIndex.drop(spark, ref)
  }

  test("compact recovers a crash between its two swap renames") {
    val ref = IvfIndex.Ref("specrecover")
    IvfIndex.drop(spark, ref)
    IvfIndex.build(vecs(0L until 40L), "vec_id", "embedding", nCells = 4, ref)
    val queries = vecs(0L until 3L)
    def res() = IvfIndex.search(queries, "vec_id", "embedding", ref,
        k = 5, nProbe = 2)
      .select($"query_id", $"rank", $"nbr_id", round($"cos", 6))
      .as[(Long, Int, Long, Double)].collect().toSet
    val before = res()
    // simulate the mid-swap crash: live renamed aside, replacement not in
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val asg = new java.io.File(wh, s"${ref.dirName}/asg")
    val old = new java.io.File(wh, s"${ref.dirName}/asg_old")
    assert(asg.renameTo(old), "simulated crash rename failed")
    IvfIndex.compact(spark, ref)
    assert(asg.exists && !old.exists)
    assert(res() === before)
    IvfIndex.drop(spark, ref)
  }

  test("write lease: a second writer fails fast; breakLease restores access") {
    val ref = IvfIndex.Ref("speclease")
    IvfIndex.drop(spark, ref)
    IvfIndex.build(vecs(0L until 40L), "vec_id", "embedding", nCells = 4, ref)
    val lease = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), s"${ref.dirName}_lease")
    java.nio.file.Files.write(lease.toPath,
      "crashed-writer".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalStateException] {
      IvfIndex.ingest(vecs(40L until 50L), "vec_id", "embedding", ref)
    }
    assert(e.getMessage.contains("crashed-writer"))
    assert(intercept[IllegalStateException] {
      IvfIndex.compact(spark, ref)
    }.getMessage.contains("crashed-writer"))
    IvfIndex.breakLease(spark, ref)
    IvfIndex.ingest(vecs(40L until 50L), "vec_id", "embedding", ref)
    assert(!lease.exists(), "lease must release when the writer completes")
    IvfIndex.drop(spark, ref)
  }

  test("search prunes to the probed cells' directories") {
    val ref = IvfIndex.Ref("specprune")
    IvfIndex.drop(spark, ref)
    IvfIndex.build(vecs(0L until 60L), "vec_id", "embedding", nCells = 4, ref)
    val out = IvfIndex.search(vecs(Seq(0L)), "vec_id", "embedding", ref,
      k = 3, nProbe = 1)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      "PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      s"probed-cell filter must prune partitions:\n$plan")
    assert(out.count() === 3)
    IvfIndex.drop(spark, ref)
  }
}
