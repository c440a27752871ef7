package graft

import graft.operators.{Dedup, GramIndex}
import org.apache.spark.sql.functions._

/** Persistent ExactSubstr gram index (operators/GramIndex.scala): the
  * ingest-on-empty == batch-operator unification, the causal
  * cross-delivery rule, zero-corpus-exchange probing, detach/attach,
  * compact equivalence, the write lease, and the ledgered stream. */
class GramIndexSpec extends SparkSpec {
  import spark.implicits._

  private val ref = GramIndex.Ref("gspec", buckets = 4)
  private val L = 12

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // planted shared content must be >= L chars to fire
  private val boiler = "SHARED BOILERPLATE FOOTER" // 25 chars
  private val batch0 = Seq[(Long, String)](
    1L -> s"alpha first-delivery prose. $boiler and a tail.",
    2L -> "beta singleton content with nothing repeated anywhere")
  private val batch1 = Seq[(Long, String)](
    11L -> s"gamma second delivery. $boiler plus its own words.",
    12L -> "delta another singleton body")
  private val batch2 = Seq[(Long, String)](
    21L -> s"alpha first-delivery prose. $boiler and a tail.", // verbatim of 1
    22L -> "epsilon WITHIN-BATCH REPEATED SPAN here",
    23L -> "zeta WITHIN-BATCH REPEATED SPAN there")
  private val batches = Seq(batch0, batch1, batch2)

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("ingest on an empty index IS the batch operator: one-delivery " +
    "ingest equals exactSubstrRemove row for row") {
    GramIndex.drop(spark, ref)
    val corpus = docs(batches.flatten: _*)
    val got = collect(GramIndex.ingest(corpus, "doc_id", "text", L, ref))
    val batch = collect(Dedup.exactSubstrRemove(corpus, "doc_id", "text", L))
    assert(got === batch)
    GramIndex.drop(spark, ref)
  }

  test("causal cross-delivery rule: the earlier delivery keeps its copy, " +
    "later arrivals lose theirs; within-batch stays remove-all") {
    GramIndex.drop(spark, ref)
    val outs = batches.map(b =>
      collect(GramIndex.ingest(docs(b: _*), "doc_id", "text", L, ref)))
    // delivery 0: nothing duplicated yet — both docs pass through intact
    assert(outs(0)(1L) === ((batch0.head._2, 0L, 0L)))
    assert(outs(0)(2L) === ((batch0(1)._2, 0L, 0L)))
    // delivery 1: the planted boilerplate matches delivery 0 and is
    // excised; the doc's own prose survives
    val (c11, s11, r11) = outs(1)(11L)
    assert(s11 >= 1L && r11 >= boiler.length.toLong)
    assert(!c11.contains("BOILERPLATE") && c11.contains("gamma"))
    assert(outs(1)(12L) === ((batch1(1)._2, 0L, 0L)))
    // delivery 2: a verbatim copy of doc 1 empties entirely; the
    // within-batch repeated span is removed from BOTH carriers
    assert(outs(2)(21L)._1 === "")
    val (c22, _, _) = outs(2)(22L)
    val (c23, _, _) = outs(2)(23L)
    assert(!c22.contains("REPEATED") && c22.contains("epsilon"))
    assert(!c23.contains("REPEATED") && c23.contains("zeta"))
    GramIndex.drop(spark, ref)
  }

  test("dedupAgainst is the read-only rule: same cleaning an ingest " +
    "would produce, and the index does not grow") {
    GramIndex.drop(spark, ref)
    GramIndex.ingest(docs(batch0: _*), "doc_id", "text", L, ref).count()
    val rows = spark.table(ref.gramsTable).count()
    val ro = collect(GramIndex.dedupAgainst(docs(batch1: _*), "doc_id", "text", L, ref))
    assert(spark.table(ref.gramsTable).count() === rows, "read-only must not append")
    val rw = collect(GramIndex.ingest(docs(batch1: _*), "doc_id", "text", L, ref))
    assert(ro === rw)
    assert(spark.table(ref.gramsTable).count() > rows)
    GramIndex.drop(spark, ref)
  }

  test("the corpus probe joins bucket-aligned: only the batch side shuffles") {
    GramIndex.drop(spark, ref)
    batches.foreach(b => GramIndex.ingest(docs(b: _*), "doc_id", "text", L, ref))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probeDocs = docs(31L -> batch0.head._2)
        .select(col("doc_id").as("_d"), col("text").as("_t"),
          length(col("text")).cast("long").as("_len"))
      val probe = Dedup.charGramFingerprints(probeDocs, L)
        .select("h", "h2").distinct()
      // OPERATOR-exact probe, h2 confirm INCLUDED: the round-15 pin
      // omitted the confirm filter and so never saw that a bare
      // `_ih2 === h2` gets lifted into the join condition — join keys
      // (h, h2), bucketing disabled, corpus shuffled. The subtraction
      // form in the operator keeps it a post-join filter; this pin now
      // covers the live path.
      val j = spark.table(ref.gramsTable).select(col("h"), col("h2").as("_ih2"))
        .join(probe, Seq("h")).filter(col("_ih2") - col("h2") === 0L)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan should be bucketed:\n$plan")
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges <= 2, s"only the probe side may shuffle, plan:\n$plan")
      assert(!plan.matches("(?s).*Exchange[^\n]*\n[^\n]*FileScan parquet[^\n]*graft_gramidx.*"),
        s"the corpus side must not sit under an Exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    GramIndex.drop(spark, ref)
  }

  test("detach + attach: files alone restore the index and it still dedups") {
    GramIndex.drop(spark, ref)
    GramIndex.ingest(docs(batch0: _*), "doc_id", "text", L, ref).count()
    val rows = spark.table(ref.gramsTable).count()
    spark.sql(s"DROP TABLE ${ref.gramsTable}")
    assert(!spark.catalog.tableExists(ref.gramsTable))
    GramIndex.attach(spark, ref)
    assert(spark.table(ref.gramsTable).count() === rows)
    val out = collect(GramIndex.ingest(docs(batch1: _*), "doc_id", "text", L, ref))
    assert(!out(11L)._1.contains("BOILERPLATE"))
    GramIndex.drop(spark, ref)
  }

  test("ingest auto-attaches: a fresh-catalog session that forgot attach() " +
    "still dedups against the on-disk corpus instead of treating it as empty") {
    GramIndex.drop(spark, ref)
    GramIndex.ingest(docs(batch0: _*), "doc_id", "text", L, ref).count()
    spark.sql(s"DROP TABLE ${ref.gramsTable}") // simulate a fresh session catalog
    assert(!spark.catalog.tableExists(ref.gramsTable))
    val out = collect(GramIndex.ingest(docs(batch1: _*), "doc_id", "text", L, ref))
    assert(!out(11L)._1.contains("BOILERPLATE"),
      "unattached on-disk index must not be silently treated as empty")
    GramIndex.drop(spark, ref)
  }

  test("compact: one file per bucket, one row per distinct gram, and the " +
    "dedup rule's results are unchanged") {
    GramIndex.drop(spark, ref)
    batches.take(2).foreach(b => GramIndex.ingest(docs(b: _*), "doc_id", "text", L, ref))
    def files() = new java.io.File(spark.conf
      .get("spark.sql.warehouse.dir").stripPrefix("file:"), ref.gramsTable)
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = collect(GramIndex.dedupAgainst(docs(batch2: _*), "doc_id", "text", L, ref))
    val distinctGrams = spark.table(ref.gramsTable).select("h", "h2").distinct().count()
    val totalCnt = spark.table(ref.gramsTable).agg(sum(col("cnt"))).head().getLong(0)
    assert(files() > ref.buckets, "expected multi-file table before compact")
    GramIndex.compact(spark, ref)
    assert(files() <= ref.buckets, s"not compacted: ${files()} files")
    assert(spark.table(ref.gramsTable).count() === distinctGrams)
    assert(spark.table(ref.gramsTable).agg(sum(col("cnt"))).head().getLong(0) === totalCnt,
      "compaction must preserve total occurrence counts")
    assert(collect(GramIndex.dedupAgainst(docs(batch2: _*), "doc_id", "text", L, ref)) === before)
    GramIndex.drop(spark, ref)
  }

  test("write lease: a second writer fails fast with the holder's name; " +
    "breakLease restores write access") {
    GramIndex.drop(spark, ref)
    GramIndex.ingest(docs(batch0: _*), "doc_id", "text", L, ref).count()
    val lease = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), s"graft_gramidx_lease_${ref.tag}")
    java.nio.file.Files.write(lease.toPath,
      "crashed-ingest".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e1 = intercept[IllegalStateException] {
      GramIndex.ingest(docs(batch1: _*), "doc_id", "text", L, ref)
    }
    assert(e1.getMessage.contains("crashed-ingest"))
    val e2 = intercept[IllegalStateException] { GramIndex.compact(spark, ref) }
    assert(e2.getMessage.contains("crashed-ingest"))
    val rows = spark.table(ref.gramsTable).count()
    GramIndex.breakLease(spark, ref)
    GramIndex.ingest(docs(batch1: _*), "doc_id", "text", L, ref).count()
    assert(spark.table(ref.gramsTable).count() > rows)
    assert(!lease.exists(), "lease must release when the writer completes")
    GramIndex.drop(spark, ref)
  }

  test("causal-rule differential fuzz: random corpora with planted " +
    "duplicates, random delivery splits, vs a plain-Scala replica") {
    val rnd = new scala.util.Random(40921)
    for (round <- 0 until 2) {
      val l = 6 + round * 3 // 6, 9
      def rs(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val base = (0 until 18).map(i => i.toLong -> rs(15 + rnd.nextInt(40)))
      // plant cross-doc and within-doc repeats like the qf8 fuzz
      val corpus = base.map { case (id, t) =>
        if (id % 3 == 0 && t.length > l + 4) {
          val src = base((id.toInt + 5) % 18)._2
          val s = rnd.nextInt(math.max(1, src.length - l - 2))
          id -> (t + src.substring(s, s + l + 2))
        } else id -> t
      }
      // random contiguous split into 3 deliveries (id order)
      val c1 = 4 + rnd.nextInt(6); val c2 = c1 + 4 + rnd.nextInt(6)
      val deliveries = Seq(corpus.take(c1), corpus.slice(c1, c2), corpus.drop(c2))
      val fref = GramIndex.Ref(s"gfuzz$round", buckets = 4)
      GramIndex.drop(spark, fref)
      val got = deliveries.map(d =>
        collect(GramIndex.ingest(docs(d: _*), "doc_id", "text", l, fref)))
        .reduce(_ ++ _)
      GramIndex.drop(spark, fref)
      // replica: per delivery, position dup iff gram seen in an EARLIER
      // delivery or >= 2 times within this delivery; boolean mask excise
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = deliveries.flatMap { d =>
        val within = scala.collection.mutable.Map.empty[String, Int]
        for ((_, t) <- d; i <- 0 to t.length - l)
          within.updateWith(t.substring(i, i + l))(c => Some(c.getOrElse(0) + 1))
        val out = d.map { case (id, t) =>
          val rm = Array.fill(t.length)(false)
          for (i <- 0 to t.length - l) {
            val g = t.substring(i, i + l)
            if (seen.contains(g) || within(g) >= 2)
              (i until i + l).foreach(rm(_) = true)
          }
          val clean = t.indices.collect { case j if !rm(j) => t(j) }.mkString
          val spans = rm.indices.count(j => rm(j) && (j == 0 || !rm(j - 1)))
          id -> ((clean, spans.toLong, rm.count(identity).toLong))
        }
        within.keys.foreach(seen.add)
        out
      }.toMap
      assert(got === expected, s"round $round (L=$l, split $c1/$c2)")
    }
  }

  test("ingestSlices is byte-identical to sequential ingest calls: same " +
    "cleaned outputs per delivery, same merged index content (round-20 " +
    "shared gram-count pass)") {
    // planted batches: cross-delivery boilerplate, a verbatim re-delivery,
    // and a within-batch repeat — every branch of the causal rule
    val aref = GramIndex.Ref("gslica", buckets = 4)
    val bref = GramIndex.Ref("gslicb", buckets = 4)
    GramIndex.drop(spark, aref); GramIndex.drop(spark, bref)
    val seqOuts = batches.map(b =>
      collect(GramIndex.ingest(docs(b: _*), "doc_id", "text", L, aref)))
    val sliceOuts = GramIndex.ingestSlices(
      batches.map(b => docs(b: _*)), "doc_id", "text", L, bref).map(collect)
    assert(sliceOuts === seqOuts)
    // merged index content matches (delivery ids differ by construction):
    // identical (h, h2, cnt) multisets
    def content(r: GramIndex.Ref) = spark.table(r.gramsTable)
      .groupBy("h", "h2").agg(sum("cnt").as("c"))
      .as[(Long, Long, Long)].collect().toSet
    assert(content(bref) === content(aref))
    GramIndex.drop(spark, aref); GramIndex.drop(spark, bref)
  }

  test("planted crash (batch): the first attempt's gram append landed but " +
    "its output was lost — a retry under the SAME delivery id is " +
    "byte-identical to the uncrashed run") {
    // uncrashed twin
    val aref = GramIndex.Ref("gcrasha", buckets = 4)
    GramIndex.drop(spark, aref)
    GramIndex.ingest(docs(batch0: _*), "doc_id", "text", L, aref, "d0").count()
    val expected = collect(GramIndex.ingest(docs(batch2: _*), "doc_id", "text", L, aref, "d1"))
    // crashed run: ingest runs to completion (grams for d1 are IN the
    // index) but the caller loses the returned result — the exact state
    // a crash between the append and the downstream write leaves behind
    val bref = GramIndex.Ref("gcrashb", buckets = 4)
    GramIndex.drop(spark, bref)
    GramIndex.ingest(docs(batch0: _*), "doc_id", "text", L, bref, "d0").count()
    GramIndex.ingest(docs(batch2: _*), "doc_id", "text", L, bref, "d1").count()
    assert(spark.table(bref.gramsTable).filter(col("delivery") === "d1").count() > 0,
      "plant precondition: the crashed attempt's grams must be in the index")
    // retry with the SAME id: self-exclusion makes it byte-identical —
    // in particular doc 22/23's within-batch FIRST occurrences and doc
    // 21's spans must match the uncrashed twin, not be over-excised
    val got = collect(GramIndex.ingest(docs(batch2: _*), "doc_id", "text", L, bref, "d1"))
    assert(got === expected)
    // compact cancels the replay's duplicate rows exactly: same distinct
    // grams AND same total counts as the uncrashed twin after its compact
    GramIndex.compact(spark, aref); GramIndex.compact(spark, bref)
    val snap = (r: GramIndex.Ref) => spark.table(r.gramsTable)
      .select("h", "h2", "cnt").collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(snap(bref) === snap(aref), "compact must cancel replayed appends exactly")
    GramIndex.drop(spark, aref); GramIndex.drop(spark, bref)
  }

  test("recoverDelivery retracts a crashed delivery: a fresh ingest of the " +
    "same content under a NEW id behaves as if the crash never happened") {
    val aref = GramIndex.Ref("grecva", buckets = 4)
    GramIndex.drop(spark, aref)
    GramIndex.ingest(docs(batch0: _*), "doc_id", "text", L, aref, "d0").count()
    val expected = collect(GramIndex.ingest(docs(batch1: _*), "doc_id", "text", L, aref, "dX"))
    val bref = GramIndex.Ref("grecvb", buckets = 4)
    GramIndex.drop(spark, bref)
    GramIndex.ingest(docs(batch0: _*), "doc_id", "text", L, bref, "d0").count()
    // crashed attempt under "d1" whose id the retry can NOT re-use
    GramIndex.ingest(docs(batch1: _*), "doc_id", "text", L, bref, "d1").count()
    GramIndex.recoverDelivery(spark, bref, "d1")
    assert(spark.table(bref.gramsTable).filter(col("delivery") === "d1").count() === 0)
    val got = collect(GramIndex.ingest(docs(batch1: _*), "doc_id", "text", L, bref, "d2"))
    assert(got === expected)
    GramIndex.drop(spark, aref); GramIndex.drop(spark, bref)
  }

  test("planted crash (streaming): grams appended, clean output and ledger " +
    "absent — the replayed micro-batch's clean output is byte-identical " +
    "to the uncrashed run") {
    val base = java.nio.file.Files.createTempDirectory("gramidx_crash").toFile
    // uncrashed twin: batch 0 then batch 1 through the micro-batch unit
    val aref = GramIndex.Ref("gscra", buckets = 4)
    GramIndex.drop(spark, aref)
    val aOut = new java.io.File(base, "a").getAbsolutePath
    GramIndex.ingestBatchOnce(docs(batch0: _*), "doc_id", "text", L, aref, aOut, 0L)
    GramIndex.ingestBatchOnce(docs(batch2: _*), "doc_id", "text", L, aref, aOut, 1L)
    val expected = collect(spark.read.parquet(s"$aOut/clean/batch_id=1")
      .select("doc_id", "clean_text", "n_spans", "n_removed"))
    // crashed run: batch 0 completes; batch 1's ingest appends its grams
    // under the stream delivery id but dies before the clean write — so
    // neither clean/batch_id=1 nor its ledger row exists
    val bref = GramIndex.Ref("gscrb", buckets = 4)
    GramIndex.drop(spark, bref)
    val bOut = new java.io.File(base, "b").getAbsolutePath
    GramIndex.ingestBatchOnce(docs(batch0: _*), "doc_id", "text", L, bref, bOut, 0L)
    GramIndex.ingest(docs(batch2: _*), "doc_id", "text", L, bref,
      GramIndex.streamDelivery(1L)).count()
    assert(!new java.io.File(s"$bOut/clean/batch_id=1").exists(),
      "plant precondition: the crashed batch's clean output must be absent")
    // restart re-executes the unledgered micro-batch
    GramIndex.ingestBatchOnce(docs(batch2: _*), "doc_id", "text", L, bref, bOut, 1L)
    val got = collect(spark.read.parquet(s"$bOut/clean/batch_id=1")
      .select("doc_id", "clean_text", "n_spans", "n_removed"))
    assert(got === expected)
    GramIndex.drop(spark, aref); GramIndex.drop(spark, bref)
    org.apache.commons.io.FileUtils.deleteQuietly(base)
  }

  test("streaming ingest: ledgered micro-batches equal sequential ingests; " +
    "restart is a no-op") {
    val sref = GramIndex.Ref("gspecstream", buckets = 4)
    GramIndex.drop(spark, sref)
    val base = java.nio.file.Files.createTempDirectory("gramidx_stream").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    batches.zipWithIndex.foreach { case (b, i) =>
      docs(b: _*).coalesce(1).write.parquet(s"$src/slice$i")
      Thread.sleep(20) // distinct mtimes → deterministic pickup order
    }
    val out = new java.io.File(base, "out").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    val schema = docs(batch0: _*).schema
    def start() = GramIndex.startStreamingIngest(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$src/slice*"),
      "doc_id", "text", L, sref, out, ckpt)
    val q = start()
    try q.processAllAvailable() finally q.stop()
    val got = collect(spark.read.parquet(s"$out/clean")
      .select("doc_id", "clean_text", "n_spans", "n_removed"))
    // twin: the same three deliveries ingested sequentially
    val tref = GramIndex.Ref("gspectwin", buckets = 4)
    GramIndex.drop(spark, tref)
    val expected = batches.map(b =>
      collect(GramIndex.ingest(docs(b: _*), "doc_id", "text", L, tref)))
      .reduce(_ ++ _)
    assert(got === expected)
    val indexRows = spark.table(sref.gramsTable).count()
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.table(sref.gramsTable).count() === indexRows)
    GramIndex.drop(spark, sref)
    GramIndex.drop(spark, tref)
    org.apache.commons.io.FileUtils.deleteQuietly(base)
  }

  test("legacy (pre-delivery-lineage) on-disk index migrates on first write " +
    "instead of dying on the missing column") {
    val lref = GramIndex.Ref("gspeclegacy", buckets = 4)
    GramIndex.drop(spark, lref)
    GramIndex.ingest(docs(batch0: _*), "doc_id", "text", L, lref).count()
    // strip the delivery column on disk — the round-12 schema (h, h2, cnt)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, lref.gramsTable)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val legacyRows = spark.table(lref.gramsTable)
      .select("h", "h2", "cnt").localCheckpoint(true)
    spark.sql(s"DROP TABLE ${lref.gramsTable}")
    fs.delete(loc, true)
    legacyRows.repartition(4, col("h")).write.format("parquet")
      .bucketBy(4, "h").sortBy("h")
      .option("path", loc.toString).saveAsTable(lref.gramsTable)
    spark.sql(s"DROP TABLE ${lref.gramsTable}") // files only, fresh catalog
    // first write against the legacy files: migrate + dedup, not an
    // unresolved-column AnalysisException
    val out = collect(GramIndex.ingest(docs(batch1: _*), "doc_id", "text", L, lref))
    assert(!out(11L)._1.contains("BOILERPLATE"),
      "migrated legacy corpus must still dedup later deliveries")
    val deliveries = spark.table(lref.gramsTable)
      .select("delivery").distinct().as[String].collect().toSet
    assert(deliveries.contains(GramIndex.CompactedDelivery),
      s"legacy rows must carry the compacted tag, got $deliveries")
    GramIndex.drop(spark, lref)
  }
}
