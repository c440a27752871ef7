package graft

import graft.functions.Hashes
import graft.operators.SimHashIndex
import org.apache.spark.sql.functions._

/** Persistent SimHash near-dup index (operators/SimHashIndex.scala): the
  * ingest-on-empty == brute-force unification (which VALIDATES the
  * pigeonhole exact-recall argument, not just the banding), the causal
  * cross-delivery pair rule, zero-corpus-exchange probing, replay
  * idempotence under the delivery id, compact equivalence, the write
  * lease, the structural-parameter guard, and the ledgered stream
  * unit. */
class SimHashIndexSpec extends SparkSpec {
  import spark.implicits._

  private val ref = SimHashIndex.Ref("shspec", buckets = 4)

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private def ing(rows: Seq[(Long, String)], delivery: String = null,
                  r: SimHashIndex.Ref = ref, maxDist: Int = 3) =
    if (delivery == null)
      SimHashIndex.ingest(docs(rows: _*), "doc_id", "text", maxDist, r)
    else
      SimHashIndex.ingest(docs(rows: _*), "doc_id", "text", maxDist, r, delivery)
  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Long)].collect().toSet

  /** Independent expectation: brute-force O(n²) Hamming over the SAME
    * fingerprint-normalized signatures, NO banding — if banding lost a
    * pair within maxDist, this catches it. */
  private def expected(rows: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Long)] = {
    val sigs = rows.map { case (id, text) =>
      val toks = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").filter(_.nonEmpty).toSeq
      id -> Hashes.simHash64(toks)
    }
    (for {
      (a, ha) <- sigs; (b, hb) <- sigs if a < b
      d = Hashes.hamming64(ha, hb) if d <= maxDist
    } yield (a, b, d.toLong)).toSet
  }

  // a long shared passage dominates the bit votes, so the one-token edit
  // flips only low-margin bits — a genuine near-duplicate; the "unrelated"
  // docs share no tokens at all
  private val passage = ("the quick brown fox jumps over the lazy dog while " +
    "seventy distinct common tokens keep every bit vote margin wide enough " +
    "that a single replaced word flips only the marginal bits of the " +
    "signature and nothing else at all") * 2
  private val batch0 = Seq[(Long, String)](
    1L -> s"$passage original ending here",
    2L -> "completely unrelated material about volcanic geology and magma")
  private val batch1 = Seq[(Long, String)](
    11L -> s"$passage modified ending here", // near-dup of 1
    12L -> "another disjoint subject entirely quantum chromodynamics lattice")
  private val batch2 = Seq[(Long, String)](
    21L -> batch0.head._2, // exact copy of doc 1
    22L -> "fresh content nothing shared with anyone anywhere")

  private val corpus = batch0 ++ batch1 ++ batch2

  test("fixture sanity: the corpus holds an exact dup (d=0), and no " +
    "unrelated pair sneaks under maxDist") {
    val exp = expected(corpus, maxDist = 3)
    assert(exp.contains((1L, 21L, 0L)))
    assert(!exp.exists(p => Set(2L, 12L, 22L).contains(p._1) ||
      Set(2L, 12L, 22L).contains(p._2)))
  }

  test("ingest on an empty index matches the brute-force O(n²) Hamming " +
    "pairs exactly — the pigeonhole recall argument, validated") {
    SimHashIndex.drop(spark, ref)
    assert(collect(ing(corpus)) === expected(corpus, maxDist = 3))
    SimHashIndex.drop(spark, ref)
  }

  test("wide structural parameters (nBlocks=13) keep recall exact at " +
    "maxDist=12: the near-duplicate pair appears") {
    val wide = SimHashIndex.Ref("shspecw", buckets = 4, nBlocks = 13)
    SimHashIndex.drop(spark, wide)
    val got = collect(ing(corpus, r = wide, maxDist = 12))
    assert(got === expected(corpus, maxDist = 12))
    assert(got.exists(p => p._1 === 1L && p._2 === 11L),
      "near-dup (one token changed) must fall within hamming 12")
    SimHashIndex.drop(spark, wide)
  }

  test("maxDist >= nBlocks is rejected — recall would be probabilistic") {
    SimHashIndex.drop(spark, ref)
    intercept[IllegalArgumentException] { ing(batch0, maxDist = 4) }
    intercept[IllegalArgumentException] {
      SimHashIndex.matchesAgainst(docs(batch0: _*), "doc_id", "text", 4, ref)
    }
  }

  test("causal cross-delivery rule: three range deliveries compose to the " +
    "global pair set, old_id always from the earlier delivery") {
    SimHashIndex.drop(spark, ref)
    val outs = Seq(batch0, batch1, batch2).map(b => collect(ing(b)))
    assert(outs(0) === Set.empty, "no pairs within delivery 0")
    assert(outs(1).exists(p => p._1 === 1L && p._2 === 11L) ===
      expected(corpus, 3).exists(p => p._1 === 1L && p._2 === 11L))
    assert(outs(2).contains((1L, 21L, 0L)), "exact copy pairs with delivery 0's doc")
    assert(outs.reduce(_ ++ _) === expected(corpus, maxDist = 3))
    SimHashIndex.drop(spark, ref)
  }

  test("ingestSignatures: the precomputed-signature face rides the same " +
    "pigeonhole/causal/replay contract — brute-force-exact on the planted " +
    "law, old_id from the earlier delivery, retry byte-identical") {
    import graft.sources.Planted
    val sref = SimHashIndex.Ref("shspecsig", buckets = 4)
    SimHashIndex.drop(spark, sref)
    val ids = (0L until 120L).toSeq
    def sigs(sel: Long => Boolean) =
      ids.filter(sel).map(d => (d, Planted.sig(d, 64))).toDF("doc_id", "sig")
    def brute(sel: Long => Boolean): Set[(Long, Long, Long)] = {
      val s = ids.filter(sel).map(d => d -> Planted.sig(d, 64))
      (for {
        (a, ha) <- s; (b, hb) <- s if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
      } yield (a, b, d.toLong)).toSet
    }
    // single delivery over everything == brute force (pigeonhole recall
    // on arbitrary 64-bit signatures, not just text simhashes)
    val all = collect(SimHashIndex.ingestSignatures(sigs(_ => true),
      "doc_id", "sig", 3, sref, "d0"))
    assert(all === brute(_ => true))
    assert(all.nonEmpty, "the planted fixture must fire")
    SimHashIndex.drop(spark, sref)
    // two deliveries: evens indexed first; cross pairs carry old_id =
    // the indexed (even) doc even when it is the larger id
    val d1 = collect(SimHashIndex.ingestSignatures(sigs(_ % 2 == 0),
      "doc_id", "sig", 3, sref, "even"))
    val d2 = collect(SimHashIndex.ingestSignatures(sigs(_ % 2 == 1),
      "doc_id", "sig", 3, sref, "odd"))
    val crossFlipped = d2.filter(p => p._1 % 2 == 0 && p._2 % 2 == 1 && p._1 > p._2)
    assert(crossFlipped.nonEmpty,
      "fixture must exercise the indexed-side-is-larger orientation")
    assert((d1 ++ d2).map(p => (p._1 min p._2, p._1 max p._2, p._3)) ===
      brute(_ => true).map(p => (p._1 min p._2, p._1 max p._2, p._3)))
    // crashed-retry replay under the same id is byte-identical
    assert(collect(SimHashIndex.ingestSignatures(sigs(_ % 2 == 1),
      "doc_id", "sig", 3, sref, "odd")) === d2)
    SimHashIndex.drop(spark, sref)
  }

  test("matchesAgainst is the read-only rule: same pairs an ingest would " +
    "return, and the index does not grow") {
    SimHashIndex.drop(spark, ref)
    ing(batch0).count()
    val rows = spark.table(ref.blocksTable).count()
    val ro = collect(SimHashIndex.matchesAgainst(docs(batch2: _*), "doc_id",
      "text", 3, ref))
    assert(spark.table(ref.blocksTable).count() === rows, "read-only must not append")
    val rw = collect(ing(batch2))
    assert(ro === rw)
    assert(spark.table(ref.blocksTable).count() > rows)
    SimHashIndex.drop(spark, ref)
  }

  test("replay idempotence: a retried ingest under the SAME delivery id " +
    "is byte-identical even after the first attempt's append landed; " +
    "recoverDelivery retracts; compact cancels the duplicate rows exactly") {
    SimHashIndex.drop(spark, ref)
    ing(batch0, "d0").count()
    val first = collect(ing(batch2, "d2"))
    val rowsAfter = spark.table(ref.blocksTable).count()
    // crashed retry: the append landed, the output did not — re-run
    val retried = collect(ing(batch2, "d2"))
    assert(retried === first, "replay must be byte-identical")
    assert(spark.table(ref.blocksTable).count() > rowsAfter,
      "the replay's residue is duplicate delivery rows")
    // a FRESH id for replayed content would pair the batch with its own
    // crashed rows — the recovery is retraction BEFORE any compact
    SimHashIndex.recoverDelivery(spark, ref, "d2")
    val fresh = collect(ing(batch2, "d2b"))
    assert(fresh === first,
      "after retraction, re-ingest under a fresh id sees only d0's rows")
    // compact cancels replay duplicates exactly
    ing(batch2, "d2b").count() // plant another replay residue
    val distinct = spark.table(ref.blocksTable)
      .select("blk", "blkval", "doc", "simhash").distinct().count()
    assert(spark.table(ref.blocksTable).count() > distinct)
    SimHashIndex.compact(spark, ref)
    assert(spark.table(ref.blocksTable).count() === distinct,
      "compact must cancel replay duplicates to one row per block row")
    SimHashIndex.drop(spark, ref)
  }

  test("compact: one file per bucket, pair results unchanged") {
    SimHashIndex.drop(spark, ref)
    Seq(batch0, batch1).foreach(b => ing(b).count())
    def files() = new java.io.File(spark.conf
      .get("spark.sql.warehouse.dir").stripPrefix("file:"), ref.blocksTable)
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = collect(SimHashIndex.matchesAgainst(docs(batch2: _*),
      "doc_id", "text", 3, ref))
    assert(files() > ref.buckets, "expected multi-file table before compact")
    SimHashIndex.compact(spark, ref)
    assert(files() <= ref.buckets, s"not compacted: ${files()} files")
    assert(collect(SimHashIndex.matchesAgainst(docs(batch2: _*), "doc_id",
      "text", 3, ref)) === before)
    SimHashIndex.drop(spark, ref)
  }

  test("the corpus probe joins bucket-aligned on (blk, blkval) with the " +
    "Hamming confirm as a post-join filter: the corpus side never sits " +
    "under an Exchange — the OPERATOR-exact construct") {
    SimHashIndex.drop(spark, ref)
    Seq(batch0, batch1).foreach(b => ing(b).count())
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // matchesAgainst IS the live probe (ingest runs the same join);
      // plan it without executing
      val j = SimHashIndex.matchesAgainst(docs(batch2: _*), "doc_id",
        "text", 3, ref)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan should be bucketed:\n$plan")
      assert(!plan.matches("(?s).*Exchange[^\n]*\n[^\n]*FileScan parquet[^\n]*graft_shidx.*"),
        s"the corpus side must not sit under an Exchange:\n$plan")
      // the signature face probes through the identical construct
      val js = SimHashIndex.matchesAgainstSignatures(
        docs(batch2: _*).select(col("doc_id"), xxhash64(col("text")).as("sig")),
        "doc_id", "sig", 3, ref)
      val planS = js.queryExecution.executedPlan.toString
      assert(planS.contains("Bucketed: true"),
        s"signature-face index scan should be bucketed:\n$planS")
      assert(!planS.matches("(?s).*Exchange[^\n]*\n[^\n]*FileScan parquet[^\n]*graft_shidx.*"),
        s"signature-face corpus side must not sit under an Exchange:\n$planS")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    SimHashIndex.drop(spark, ref)
  }

  test("write lease: a second writer fails fast with the holder's name; " +
    "breakLease restores write access") {
    SimHashIndex.drop(spark, ref)
    ing(batch0).count()
    val lease = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), s"graft_shidx_lease_${ref.tag}")
    java.nio.file.Files.write(lease.toPath,
      "crashed-ingest".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e1 = intercept[IllegalStateException] { ing(batch1) }
    assert(e1.getMessage.contains("crashed-ingest"))
    val e2 = intercept[IllegalStateException] { SimHashIndex.compact(spark, ref) }
    assert(e2.getMessage.contains("crashed-ingest"))
    SimHashIndex.breakLease(spark, ref)
    ing(batch1).count()
    assert(!lease.exists(), "lease must release when the writer completes")
    SimHashIndex.drop(spark, ref)
  }

  test("fsck flags a torn block set (planted partial append), " +
    "recoverDelivery repairs it; complete + replayed rows never flag") {
    SimHashIndex.drop(spark, ref)
    ing(batch0, "d0").count()
    ing(batch0, "d0").count() // replay residue: byte-duplicate COMPLETE rows
    SimHashIndex.verifyConsistent(spark, ref) // duplicates must not flag
    // planted crash: a doc lands only 1 of its 4 block rows
    Seq((0, 1L, 999L, 1L, "torn")).toDF("blk", "blkval", "doc", "simhash", "delivery")
      .write.mode("append").format("parquet")
      .bucketBy(ref.buckets, "blk", "blkval").sortBy("blk", "blkval")
      .saveAsTable(ref.blocksTable)
    val bad = SimHashIndex.fsck(spark, ref)
      .as[(Long, String, Long)].collect().toSeq
    assert(bad === Seq((999L, "torn", 1L)))
    intercept[IllegalStateException] { SimHashIndex.verifyConsistent(spark, ref) }
    // the documented repair: retract the torn delivery, re-ingest whole
    SimHashIndex.recoverDelivery(spark, ref, "torn")
    SimHashIndex.verifyConsistent(spark, ref)
    SimHashIndex.drop(spark, ref)
  }

  test("ledgered stream unit: an already-ledgered batch is skipped whole; " +
    "an unledgered replay (planted crash) re-runs byte-identically") {
    SimHashIndex.drop(spark, ref)
    val base = java.nio.file.Files.createTempDirectory("shidxstream").toFile
    val outDir = new java.io.File(base, "out").getAbsolutePath
    SimHashIndex.ingestBatchOnce(docs(batch0: _*), "doc_id", "text", 3,
      ref, outDir, bid = 0L)
    SimHashIndex.ingestBatchOnce(docs(batch2: _*), "doc_id", "text", 3,
      ref, outDir, bid = 1L)
    val out1 = spark.read.parquet(s"$outDir/pairs/batch_id=1")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out1.nonEmpty, "the exact copy must pair against batch 0")
    val idxRows = spark.table(ref.blocksTable).count()
    // ledgered replay: skipped whole (no append, no rewrite)
    SimHashIndex.ingestBatchOnce(docs(batch2: _*), "doc_id", "text", 3,
      ref, outDir, bid = 1L)
    assert(spark.table(ref.blocksTable).count() === idxRows)
    // planted crash: the ledger mark is lost but the append survived —
    // the re-run self-excludes and rewrites identical output
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$outDir/_ledger"), true)
    SimHashIndex.ingestBatchOnce(docs(batch2: _*), "doc_id", "text", 3,
      ref, outDir, bid = 1L)
    val replayed = spark.read.parquet(s"$outDir/pairs/batch_id=1")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(replayed === out1, "unledgered replay must rewrite identical rows")
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    SimHashIndex.drop(spark, ref)
  }
}
