package graft

import graft.operators.ContamIndex
import org.apache.spark.sql.functions._

/** Persistent benchmark-gram index (operators/ContamIndex.scala): the
  * accumulated audit equals the one-shot contamination verdict, replayed
  * deliveries are invisible (set semantics), the streaming ingest is
  * ledgered, the writer lease excludes, and the audit plan keeps the
  * index side bucket-local while the training corpus never broadcasts. */
class ContamIndexSpec extends SparkSpec {
  import spark.implicits._

  private val ref = ContamIndex.Ref("specci", buckets = 4)

  // 3-gram law fixture: two benchmark snapshots, four train docs with
  // known overlaps (n=3 token grams)
  private val bench = Seq(
    (100L, 0L, "alpha beta gamma delta unique snapzero words"),
    (101L, 1L, "epsilon zeta eta theta other snapone content"))
  private val train = Seq(
    (1L, "prefix alpha beta gamma suffix"),              // snap-0 hit
    (2L, "leading epsilon zeta eta trailing"),           // snap-1 hit
    (3L, "alpha beta gamma and also epsilon zeta eta"),  // both -> first 0
    (4L, "completely clean text sharing no benchmark trigrams at all"))
  private def benchDf(rows: Seq[(Long, Long, String)]) =
    rows.toDF("doc_id", "snap", "text")
  private val trainDf = train.toDF("doc_id", "text")

  private def auditMap() =
    ContamIndex.audit(trainDf, "doc_id", "text", n = 3, ref)
      .select($"doc", $"n_shared", $"contaminated", $"first_flagged_snap")
      .as[(Long, Long, Boolean, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("accumulated deliveries produce the one-shot verdict with " +
    "per-snapshot first-flag lineage; a replayed delivery is invisible") {
    ContamIndex.drop(spark, ref)
    ContamIndex.ingest(benchDf(bench.take(1)), "text", "snap", n = 3, ref, "d0")
    // after snapshot 0 only: doc 2 is still clean, doc 3 flags via snap 0
    val mid = auditMap()
    assert(mid(1L)._2 && !mid(2L)._2 && mid(3L) === ((1L, true, 0L)))
    ContamIndex.ingest(benchDf(bench.drop(1)), "text", "snap", n = 3, ref, "d1")
    val got = auditMap()
    // shared grams per doc: doc1 {alpha beta gamma, beta gamma delta?} —
    // verify counts against an independent string replay instead of
    // hand-arithmetic
    val benchGrams = bench.flatMap { case (_, snap, t) =>
      val w = t.split("\\s+").filter(_.nonEmpty)
      w.sliding(3).filter(_.length == 3).map(g => g.mkString(" ") -> snap)
    }.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).min }
    val want = train.map { case (id, t) =>
      val w = t.split("\\s+").filter(_.nonEmpty)
      val gs = w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val hit = gs.filter(benchGrams.contains)
      id -> ((hit.size.toLong, hit.nonEmpty,
        if (hit.isEmpty) -1L else hit.map(benchGrams).min))
    }.toMap
    assert(got === want)
    assert(got(4L) === ((0L, false, -1L)) && got(2L)._3 === 1L && got(3L)._3 === 0L)
    // REPLAY: re-landing a delta (retry under a fresh delivery id) leaves
    // duplicate rows at rest that the min/distinct audit cannot see
    ContamIndex.ingest(benchDf(bench.take(1)), "text", "snap", n = 3, ref, "d0retry")
    assert(auditMap() === got)
    ContamIndex.drop(spark, ref)
  }

  test("streaming ingest: deltas accumulate across micro-batches, restart " +
    "is a ledgered no-op, and the index survives detach + attach") {
    ContamIndex.drop(spark, ref)
    val base = java.nio.file.Files.createTempDirectory("contamidx").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    bench.zipWithIndex.foreach { case (b, i) =>
      benchDf(Seq(b)).coalesce(1).write.parquet(s"$src/snap$i")
      Thread.sleep(20)
    }
    val out = new java.io.File(base, "out").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    val schema = benchDf(bench).schema
    def start() = ContamIndex.startStreamingIngest(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$src/snap*"), "text", "snap", n = 3, ref, out, ckpt)
    val q = start()
    try q.processAllAvailable() finally q.stop()
    val got = auditMap()
    assert(got.values.count(_._2) === 3 && got(3L)._3 === 0L)
    val rows = spark.table(ref.gramsTable).count()
    // restart: nothing new — ledger blocks re-ingest, no growth
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.table(ref.gramsTable).count() === rows)
    // detach + attach: files alone restore the audit
    spark.sql(s"DROP TABLE ${ref.gramsTable}")
    assert(!spark.catalog.tableExists(ref.gramsTable))
    assert(auditMap() === got) // audit() re-attaches
    ContamIndex.drop(spark, ref)
    org.apache.commons.io.FileUtils.deleteQuietly(base)
  }

  test("write lease: a lingering holder blocks ingest fast; breakLease " +
    "restores write access") {
    ContamIndex.drop(spark, ref)
    ContamIndex.ingest(benchDf(bench.take(1)), "text", "snap", n = 3, ref, "d0")
    val lease = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), s"graft_contamidx_lease_${ref.tag}")
    java.nio.file.Files.write(lease.toPath,
      "crashed-contam".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalStateException] {
      ContamIndex.ingest(benchDf(bench.drop(1)), "text", "snap", n = 3, ref, "d1")
    }
    assert(e.getMessage.contains("crashed-contam"))
    ContamIndex.breakLease(spark, ref)
    ContamIndex.ingest(benchDf(bench.drop(1)), "text", "snap", n = 3, ref, "d1")
    assert(auditMap()(2L)._2)
    assert(!lease.exists(), "lease must release when the writer completes")
    ContamIndex.drop(spark, ref)
  }

  test("audit plan: the index side aggregates bucket-locally on the gram " +
    "bucketing, only train-sized frames shuffle, and the training corpus " +
    "never broadcasts") {
    ContamIndex.drop(spark, ref)
    ContamIndex.ingest(benchDf(bench), "text", "snap", n = 3, ref, "d0")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = ContamIndex.audit(trainDf, "doc_id", "text", n = 3, ref)
      a.collect()
      val plan = a.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"the grams scan must ride its bucketing into the min-snap aggregate:\n$plan")
      // shuffles: exploded train grams into the gram bucketing, the
      // per-doc rollup, and the final per-doc left join — all train-sized;
      // the index side adds NONE. AQE's toString repeats nodes under
      // "== Initial Plan ==" — count the final section only.
      val finalPlan = plan.split("== Initial Plan ==")(0)
      assert("Exchange hashpartitioning".r.findAllIn(finalPlan).size <= 3,
        s"the index side must not add exchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    ContamIndex.drop(spark, ref)
  }
}
