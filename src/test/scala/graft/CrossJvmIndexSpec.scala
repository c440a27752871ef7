package graft

import graft.operators.{IvfIndex, LshIndex, ML, PQ, PqIndex, Similarity}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The cross-PROCESS half of the persistent-index story, exercised with a
  * REAL second JVM (round-9 VERDICT stretch item #8): `IndexSeedMain`
  * builds each index in a freshly forked java process — its own
  * SparkSession, catalog, and block manager, sharing only the warehouse
  * DIRECTORY with this JVM — and this JVM attaches/searches the files
  * alone. That is exactly the deployment shape: builder job and consumer
  * job on common storage, nothing else shared.
  *
  * A gate-query form of this was considered and rejected on sweep cost:
  * a child SparkSession costs ~10-15 s per run, paid on EVERY bench sweep
  * and Verify pass; this spec pays it once per suite and pins the same
  * claim. */
class CrossJvmIndexSpec extends SparkSpec {
  import spark.implicits._

  private def warehouse: String =
    spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")

  private def seedInFreshJvm(mode: String, tag: String): Unit = {
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java")
    // carry the module-opens flags this JVM runs with (Spark needs them)
    val opens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports")
        || a.startsWith("--enable-native-access"))
    val cmd = Seq(javaBin.getAbsolutePath) ++ opens ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.IndexSeedMain", warehouse, mode, tag)
    // private cwd so the child's scratch state never collides with ours
    val cwd = java.nio.file.Files.createTempDirectory(s"xjvm_$mode").toFile
    val p = new ProcessBuilder(cmd: _*).directory(cwd)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val rc = p.waitFor()
    assert(rc === 0, s"seed JVM failed (rc=$rc):\n${out.takeRight(4000)}")
  }

  test("LshIndex built by a second JVM attaches and serves ingests here") {
    val ref = LshIndex.Ref("xjvmlsh", buckets = 4)
    LshIndex.drop(spark, ref) // clear any prior files + catalog entries
    seedInFreshJvm("lsh", ref.tag)
    assert(!spark.catalog.tableExists(ref.bandedTable),
      "this session's catalog must not know the foreign build")
    LshIndex.attach(spark, ref)
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val out = LshIndex.ingest(Seq(41L -> base).toDF("doc_id", "text"),
      "doc_id", "text", n = 2, k = 128, bands = 64, threshold = 0.5, ref)
    // the probe doc matches exactly the four near-identical corpus docs
    // the OTHER process indexed
    assert(out.select($"old_id").as[Long].collect().toSet ===
      Set(1L, 3L, 11L, 21L))
    LshIndex.drop(spark, ref)
  }

  test("IvfIndex built by a second JVM serves searches here, equal to " +
    "in-memory ivfTopK over the same corpus") {
    val ref = IvfIndex.Ref("xjvmivf")
    IvfIndex.drop(spark, ref)
    seedInFreshJvm("ivf", ref.tag)
    val corpus = IndexSeedMain.vecs(0L until 60L).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 3)
    val got = IvfIndex.search(queries, "vec_id", "embedding", ref,
        k = 5, nProbe = 2)
      .select($"query_id", $"rank", $"nbr_id").as[(Long, Int, Long)]
      .collect().toSet
    val want = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
        "vec_id", k = 5, nCells = 4, nProbe = 2)
      .select($"query_id", $"rank", $"nbr_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(got === want && got.nonEmpty)
    IvfIndex.drop(spark, ref)
  }

  test("PqIndex built by a second JVM serves IVFADC searches here, equal " +
    "to in-memory ivfAdcTopK over the same fits") {
    val ref = PqIndex.Ref("xjvmpq")
    PqIndex.drop(spark, ref)
    seedInFreshJvm("pq", ref.tag)
    val corpus = IndexSeedMain.vecs(0L until 60L).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 3)
    val got = PqIndex.search(queries, "vec_id", "embedding", dim = 8, m = 4,
        nProbe = 2, topK = 5, ref)
      .select($"q_id", $"rank", $"id", $"adc_dist")
      .as[(Long, Int, Long, Long)].collect().toSet
    val coarse = ML.kMeansScaled(corpus, "vec_id", "embedding", k = 4, iters = 1)
    val model = PQ.fit(corpus, "vec_id", "embedding", dim = 8, m = 4,
      k = 4, iters = 1)
    val want = PQ.ivfAdcTopK(coarse, model, queries, "vec_id", "embedding",
        dim = 8, m = 4, nProbe = 2, topK = 5)
      .select($"q_id", $"rank", $"id", $"adc_dist")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
    PqIndex.drop(spark, ref)
  }

  test("a streaming loop CRASHED in a second JVM resumes here from " +
    "checkpoint + feedback dir alone and reaches the exact fixpoint") {
    import org.apache.spark.sql.functions.col
    // the crashed-writer half runs in a fresh JVM: chain-graph SSSP with
    // a crash injected after round 3 of ~10 (IndexSeedMain "loopcrash")
    val work = java.nio.file.Files.createTempDirectory("xjvmloop")
      .toFile.getAbsolutePath
    seedInFreshJvm("loopcrash", work)
    // the crash must have left PARTIAL progress: some rounds, not all
    val partial = spark.read.parquet(s"$work/out/rounds")
      .select(col("node")).distinct().count()
    assert(partial > 1 && partial < 10,
      s"expected a mid-loop crash, saw $partial nodes reached")
    // resume in THIS JVM over the same work dir: same edges, same root —
    // the query restarts from the checkpoint's offsets and state, replays
    // the failed batch, and drains to the fixpoint
    val edges = (1L until 10L).map(i => (i, i + 1, 1L)).toDF("src", "dst", "wt")
    val got = graft.streaming.IterateStream
      .ssspToFixpoint(edges, root = 1L, work)
      .as[(Long, Long)].collect().toMap
    assert(got === (1L to 10L).map(i => i -> (i - 1L)).toMap)
  }
}
