package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Streaming stride curriculum (streaming/StreamingCurriculum.scala):
  * causal cross-delivery ranks vs a hash-replica, single-delivery
  * equivalence to the batch operator, the idempotent state layout's
  * crash plant, and the ledgered restart. */
class StreamingCurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "lang")

  private def hashOf(ids: Seq[Long]): Map[Long, Double] =
    ids.toDF("doc_id")
      .select(col("doc_id"), Sampling.unitHash(col("doc_id"), "stride").as("h"))
      .as[(Long, Double)].collect().toMap

  test("two deliveries: causal per-group ranks continue across batches " +
    "and match the plain hash-order replica; a crashed attempt's " +
    "half-written state delta is ignored; restart is a ledgered no-op") {
    val d1 = (0L until 24L).map(i => i -> s"l${i % 3}")
    val d2 = (100L until 140L).map(i => i -> s"l${i % 4}") // adds group l3
    val weights = Map("l0" -> 4L, "l1" -> 2L, "l2" -> 1L, "l3" -> 3L)
    val base = java.nio.file.Files.createTempDirectory("curr_stream").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    docs(d1).coalesce(1).write.parquet(s"$src/slice0")
    Thread.sleep(20)
    docs(d2).coalesce(1).write.parquet(s"$src/slice1")
    val stateDir = new java.io.File(base, "state").getAbsolutePath
    val outDir = new java.io.File(base, "out").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    // plant a CRASHED first attempt of batch 0: its state delta landed
    // but no output and no ledger — the replayed batch 0 must NOT rank
    // after its own ghost (self-excluding read), and batch 1 must see
    // the real overwritten delta, not this one
    Seq(("l0", 999L)).toDF("lang", "n")
      .write.mode("overwrite").parquet(s"$stateDir/delta/batch_id=0")
    val schema = docs(d1).schema
    def start() = graft.streaming.StreamingCurriculum.startStrideIngest(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$src/slice*"),
      "doc_id", "lang", weights, stateDir, outDir, ckpt)
    val q = start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$outDir/ordered")
      .select("doc_id", "lang", "rk", "vt")
      .as[(Long, String, Long, Long)].collect().toSet
    // replica: per delivery, per group, rank by (unitHash, id); ranks
    // continue from the group's delivered-so-far count; vt is the
    // integer stride formula
    val h = hashOf((d1 ++ d2).map(_._1))
    var cnt = Map.empty[String, Long]
    val expected = Seq(d1, d2).flatMap { d =>
      val out = d.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(r => (h(r._1), r._1)).zipWithIndex.map { case ((id, _), k) =>
          val rk = cnt.getOrElse(g, 0L) + k + 1L
          (id, g, rk, ((2L * rk - 1L) * 1000000L) / (2L * weights(g)))
        }
      }
      cnt = out.groupBy(_._2).map { case (g, rs) =>
        g -> (cnt.getOrElse(g, 0L) + rs.length) } ++
        cnt.filterNot(kv => out.exists(_._2 == kv._1))
      out
    }.toSet
    assert(got === expected)
    // the planted bogus delta for batch 0 was overwritten by the real one
    val delta0 = spark.read.parquet(s"$stateDir/delta")
      .filter(col("batch_id") === 0).select("lang", "n")
      .as[(String, Long)].collect().toMap
    assert(delta0 === d1.groupBy(_._2).map { case (g, rs) => g -> rs.length.toLong })
    // restart over the same source + checkpoint: no new work, no drift
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$outDir/ordered")
      .select("doc_id", "lang", "rk", "vt")
      .as[(Long, String, Long, Long)].collect().toSet === expected)
    org.apache.commons.io.FileUtils.deleteQuietly(base)
  }

  private def cdocs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("competence: causal ranks continue across deliveries against the " +
    "running difficulty histogram; crashed delta ignored; restart no-op") {
    // difficulty = token count; craft lengths so cross-delivery ties exist
    def text(n: Int) = Seq.fill(n)("w").mkString(" ")
    val d1 = Seq(1L -> text(3), 2L -> text(5), 3L -> text(3), 4L -> text(8))
    val d2 = Seq(11L -> text(3), 12L -> text(4), 13L -> text(8), 14L -> text(1))
    val T = 1000L
    val base = java.nio.file.Files.createTempDirectory("comp_stream").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    cdocs(d1).coalesce(1).write.parquet(s"$src/slice0")
    Thread.sleep(20)
    cdocs(d2).coalesce(1).write.parquet(s"$src/slice1")
    val stateDir = new java.io.File(base, "state").getAbsolutePath
    val outDir = new java.io.File(base, "out").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    // crashed first attempt of batch 0: delta landed, output/ledger did not
    Seq((3L, 999L)).toDF("n_toks", "cnt")
      .write.mode("overwrite").parquet(s"$stateDir/delta/batch_id=0")
    def start() = graft.streaming.StreamingCurriculum.startCompetenceIngest(
      spark.readStream.schema(cdocs(d1).schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/slice*"),
      "doc_id", "text", T, stateDir, outDir, ckpt)
    val q = start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$outDir/sched")
      .select("doc_id", "n_toks", "rank", "first_step")
      .as[(Long, Long, Long, Long)].collect().toSet
    // replica: per delivery, rank = |earlier with n_toks <= d| +
    // within-batch (n_toks, id) rank; N = docs so far
    val hist = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var seen = 0L
    val expected = Seq(d1, d2).flatMap { d =>
      val withN = d.map { case (id, t) =>
        (id, t.split("\\s+").count(_.nonEmpty).toLong) }
      val nNow = seen + withN.length
      val out = withN.sortBy { case (id, nt) => (nt, id) }.zipWithIndex.map {
        case ((id, nt), k) =>
          val rank = hist.filter(_._1 <= nt).values.sum + k + 1L
          (id, nt, rank, (rank * rank * T + nNow * nNow - 1L) / (nNow * nNow))
      }
      withN.foreach { case (_, nt) => hist(nt) += 1L }
      seen = nNow
      out
    }.toSet
    assert(got === expected)
    // the planted bogus delta was overwritten by batch 0's real histogram
    val delta0 = spark.read.parquet(s"$stateDir/delta")
      .filter(col("batch_id") === 0).select("n_toks", "cnt")
      .as[(Long, Long)].collect().toMap
    assert(delta0 === Map(3L -> 2L, 5L -> 1L, 8L -> 1L))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$outDir/sched")
      .select("doc_id", "n_toks", "rank", "first_step")
      .as[(Long, Long, Long, Long)].collect().toSet === expected)
    org.apache.commons.io.FileUtils.deleteQuietly(base)
  }

  test("competence: a single delivery reproduces the batch " +
    "competenceCurriculum verbatim") {
    val rnd = new scala.util.Random(31007)
    val rows = (0L until 60L).map(i =>
      i -> Seq.fill(1 + rnd.nextInt(30))("tok").mkString(" "))
    val base = java.nio.file.Files.createTempDirectory("comp_single").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    cdocs(rows).coalesce(1).write.parquet(s"$src/slice0")
    val q = graft.streaming.StreamingCurriculum.startCompetenceIngest(
      spark.readStream.schema(cdocs(rows).schema).parquet(s"$src/slice*"),
      "doc_id", "text", totalSteps = 500L,
      new java.io.File(base, "state").getAbsolutePath,
      new java.io.File(base, "out").getAbsolutePath,
      new java.io.File(base, "ckpt").getAbsolutePath)
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$base/out/sched")
      .select("doc_id", "n_toks", "rank", "first_step")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Sampling.competenceCurriculum(cdocs(rows), "doc_id", "text",
        totalSteps = 500L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === batch)
    org.apache.commons.io.FileUtils.deleteQuietly(base)
  }

  test("mixture→curriculum composition: per-delivery epochs realize each " +
    "delivery's UniMax allocation, copy ranks continue causally under " +
    "cumulative sqrt weights; a crashed attempt's half-written state is " +
    "ignored; restart is a ledgered no-op") {
    val d1 = (0L until 30L).map(i => i -> s"l${i % 3}")
    val d2 = (100L until 150L).map(i => i -> s"l${i % 4}") // adds group l3
    val budget = 40L; val epochs = 2L
    val base = java.nio.file.Files.createTempDirectory("mixcurr").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    docs(d1).coalesce(1).write.parquet(s"$src/slice0")
    Thread.sleep(20)
    docs(d2).coalesce(1).write.parquet(s"$src/slice1")
    val stateDir = new java.io.File(base, "state").getAbsolutePath
    val outDir = new java.io.File(base, "out").getAbsolutePath
    // crashed first attempt of batch 0: a bogus state delta landed but no
    // output and no ledger — the replay must not see its own ghost
    Seq(("l0", 999L)).toDF("lang", "n")
      .write.mode("overwrite").parquet(s"$stateDir/delta/batch_id=0")
    def start() = graft.streaming.StreamingCurriculum.startMixtureCurriculumIngest(
      spark.readStream.schema(docs(d1).schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$src/slice*"),
      "doc_id", "lang", budget, epochs, stateDir, outDir,
      new java.io.File(base, "ckpt").getAbsolutePath)
    val q = start()
    try q.processAllAvailable() finally q.stop()
    // replica: per delivery, the batch UniMax realization (gate-pinned
    // operator, trusted here) exploded to copy ids; then the stride stage
    // with CUMULATIVE per-group copy counts for weights and rank bases
    def copiesOf(d: Seq[(Long, String)]): Seq[(String, String)] =
      Sampling.unimaxSample(docs(d), "doc_id", "lang", budget, epochs)
        .as[(Long, String, Long)].collect().toSeq.flatMap { case (id, g, nc) =>
          (0L until nc).map(k => (s"$id#$k", g)) }
    def hashOfS(ids: Seq[String]): Map[String, Double] =
      ids.toDF("cid")
        .select(col("cid"), Sampling.unitHash(col("cid"), "stride").as("h"))
        .as[(String, Double)].collect().toMap
    var cnt = Map.empty[String, Long]
    val expected = Seq(d1, d2).map { d =>
      val cp = copiesOf(d)
      val h = hashOfS(cp.map(_._1))
      val keyed = cp.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
        val w = math.floor(math.sqrt(
          (cnt.getOrElse(g, 0L) + rows.length).toDouble)).toLong
        rows.sortBy(r => (h(r._1), r._1)).zipWithIndex.map { case ((cid, _), k) =>
          val rk = cnt.getOrElse(g, 0L) + k + 1L
          (cid, g, rk, ((2L * rk - 1L) * 1000000L) / (2L * w))
        }
      }
      cnt = cp.groupBy(_._2).map { case (g, rs) =>
        g -> (cnt.getOrElse(g, 0L) + rs.length) } ++
        cnt.filterNot(kv => cp.exists(_._2 == kv._1))
      keyed.sortBy { case (_, g, rk, vt) => (vt, g, rk) }.zipWithIndex
        .map { case ((cid, g, rk, vt), i) => (cid, g, rk, vt, i.toLong) }.toSet
    }
    def readEpoch(bid: Long) = spark.read
      .parquet(s"$outDir/epoch/batch_id=$bid")
      .select("cid", "lang", "rk", "vt", "pos")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(readEpoch(0) === expected(0), "delivery 0 epoch")
    assert(readEpoch(1) === expected(1), "delivery 1 epoch (causal ranks)")
    // the planted bogus delta was overwritten by batch 0's real counts
    val delta0 = spark.read.parquet(s"$stateDir/delta")
      .filter(col("batch_id") === 0).select("lang", "n")
      .as[(String, Long)].collect().toMap
    assert(delta0.values.sum === expected(0).size.toLong)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(readEpoch(0) === expected(0) && readEpoch(1) === expected(1))
    org.apache.commons.io.FileUtils.deleteQuietly(base)
  }

  test("single delivery under the batch operator's sqrt weights emits " +
    "the batch strideInterleave rows verbatim (undeclared groups drop)") {
    val rows = (0L until 90L).map(i => i -> s"l${i % 3}")
    val weights = docs(rows).groupBy("lang").agg(count(lit(1)).as("n"))
      .select(col("lang"), floor(sqrt(col("n").cast("double"))).cast("long").as("w"))
      .as[(String, Long)].collect().toMap
    val base = java.nio.file.Files.createTempDirectory("curr_single").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    docs(rows).coalesce(1).write.parquet(s"$src/slice0")
    val q = graft.streaming.StreamingCurriculum.startStrideIngest(
      spark.readStream.schema(docs(rows).schema).parquet(s"$src/slice*"),
      "doc_id", "lang", weights,
      new java.io.File(base, "state").getAbsolutePath,
      new java.io.File(base, "out").getAbsolutePath,
      new java.io.File(base, "ckpt").getAbsolutePath)
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$base/out/ordered")
      .select("doc_id", "lang", "rk", "vt")
      .as[(Long, String, Long, Long)].collect().toSet
    val batch = Sampling.strideInterleave(docs(rows), "doc_id", "lang")
      .select("doc_id", "lang", "rk", "vt")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got === batch)
    org.apache.commons.io.FileUtils.deleteQuietly(base)
  }
}
