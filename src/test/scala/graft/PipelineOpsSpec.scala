package graft

import graft.operators.{AsOfJoin, BloomPrune, Dedup, RangeJoin, Sampling, TextPipeline}
import org.apache.spark.sql.functions._

/** Round-3 operators: as-of join, binned range join, bloom pruning,
  * deterministic sampling, chunking/packing/PII/LM-scoring pipeline. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tsUs(us: Long) = new java.sql.Timestamp(us / 1000)

  // ---- AsOfJoin -----------------------------------------------------------

  private def mkEvents(rows: Seq[(Long, Long, Long, Double)]) = // key, id, tsUs, v
    rows.toDF("user_id", "event_id", "us", "value")
      .withColumn("ts", timestamp_micros($"us")).drop("us")

  test("asof backward: latest right at-or-before each left row, per key") {
    val left = mkEvents(Seq((1L, 10L, 1000L, 0.0), (1L, 11L, 2500L, 0.0),
      (2L, 12L, 9999L, 0.0))).select("user_id", "event_id", "ts")
    val right = mkEvents(Seq((1L, 20L, 1000L, 1.0), (1L, 21L, 2000L, 2.0),
      (1L, 22L, 3000L, 3.0))).select("user_id", "ts", "event_id", "value")
    val got = AsOfJoin.backward(left, right, "user_id", "ts", "ts", "event_id")
      .select($"event_id", $"r_event_id", $"r_value")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1)
    assert(got === Seq(
      (10L, Some(20L), Some(1.0)),   // equal ts is inclusive
      (11L, Some(21L), Some(2.0)),   // 2500 -> right at 2000, not 3000
      (12L, None, None)))            // key 2 has no right rows
  }

  test("asof backward: equal-timestamp ties pick max tiebreak, deterministically") {
    val left = mkEvents(Seq((1L, 10L, 5000L, 0.0))).select("user_id", "event_id", "ts")
    val right = mkEvents(Seq((1L, 31L, 5000L, 1.0), (1L, 33L, 5000L, 3.0),
      (1L, 32L, 5000L, 2.0))).select("user_id", "ts", "event_id", "value")
    val got = AsOfJoin.backward(left, right, "user_id", "ts", "ts", "event_id")
      .select($"r_event_id").as[Long].collect()
    assert(got.toSeq === Seq(33L))
  }

  test("asof backward: tolerance nulls out stale matches") {
    val left = mkEvents(Seq((1L, 10L, 10000L, 0.0))).select("user_id", "event_id", "ts")
    val right = mkEvents(Seq((1L, 20L, 1000L, 1.0))).select("user_id", "ts", "event_id", "value")
    val within = AsOfJoin.backward(left, right, "user_id", "ts", "ts", "event_id",
      toleranceUs = 9000L).select($"r_event_id").as[Option[Long]].collect()
    val stale = AsOfJoin.backward(left, right, "user_id", "ts", "ts", "event_id",
      toleranceUs = 8999L).select($"r_event_id").as[Option[Long]].collect()
    assert(within.toSeq === Seq(Some(20L)) && stale.toSeq === Seq(None))
  }

  test("asof forward: earliest right at-or-after; min tiebreak on ties") {
    val left = mkEvents(Seq((1L, 10L, 2000L, 0.0), (1L, 11L, 3500L, 0.0)))
      .select("user_id", "event_id", "ts")
    val right = mkEvents(Seq((1L, 20L, 1000L, 1.0), (1L, 21L, 2000L, 2.0),
      (1L, 23L, 4000L, 4.0), (1L, 22L, 4000L, 3.0)))
      .select("user_id", "ts", "event_id", "value")
    val got = AsOfJoin.forward(left, right, "user_id", "ts", "ts", "event_id")
      .select($"event_id", $"r_event_id").as[(Long, Option[Long])]
      .collect().sortBy(_._1)
    assert(got === Seq((10L, Some(21L)), (11L, Some(22L))))
  }

  test("asof backward/forward match a brute-force oracle on randomized inputs") {
    // dense timestamp collisions + multi-key + tolerance, 3 seeded rounds
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val lrows = (1 to 150).map(i =>
        (rnd.nextInt(4).toLong, i.toLong, rnd.nextInt(40) * 1000L, 0.0))
      val rrows = (1 to 150).map(i =>
        (rnd.nextInt(4).toLong, 1000L + i, rnd.nextInt(40) * 1000L, i.toDouble))
      val tol = if (seed % 2 == 0) 5000L else 0L
      val left = mkEvents(lrows).select("user_id", "event_id", "ts")
      val right = mkEvents(rrows).select("user_id", "ts", "event_id", "value")

      def bruteBackward = lrows.map { case (k, id, ts, _) =>
        val cands = rrows.filter(r => r._1 == k && r._3 <= ts &&
          (tol <= 0 || ts - r._3 <= tol))
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(r => (r._3, r._2))._2))
      }.sortBy(_._1)
      def bruteForward = lrows.map { case (k, id, ts, _) =>
        val cands = rrows.filter(r => r._1 == k && r._3 >= ts)
        id -> (if (cands.isEmpty) None
               else Some(cands.minBy(r => (r._3, r._2))._2))
      }.sortBy(_._1)

      val gotB = AsOfJoin.backward(left, right, "user_id", "ts", "ts", "event_id",
          toleranceUs = tol)
        .select($"event_id", $"r_event_id").as[(Long, Option[Long])]
        .collect().sortBy(_._1).toSeq
      assert(gotB === bruteBackward, s"backward mismatch, seed=$seed")

      val gotF = AsOfJoin.forward(left, right, "user_id", "ts", "ts", "event_id")
        .select($"event_id", $"r_event_id").as[(Long, Option[Long])]
        .collect().sortBy(_._1).toSeq
      assert(gotF === bruteForward, s"forward mismatch, seed=$seed")
    }
  }

  test("asof join is one sort-shuffle, no join blowup in the plan") {
    val left = mkEvents((1 to 100).map(i => (i.toLong % 5, i.toLong, i * 1000L, 0.0)))
      .select("user_id", "event_id", "ts")
    val right = mkEvents((1 to 100).map(i => (i.toLong % 5, 200L + i, i * 700L, 1.0)))
      .select("user_id", "ts", "event_id", "value")
    val plan = AsOfJoin.backward(left, right, "user_id", "ts", "ts", "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join operator:\n$plan")
    assert("(?<!Broadcast)Exchange ".r.findAllIn(plan).length <= 1,
      s"expected a single shuffle:\n$plan")
  }

  // ---- RangeJoin ----------------------------------------------------------

  test("binned range join equals the nested-loop semantics exactly") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("pid", "pt")
    val intervals = (1 to 80).map { i =>
      val lo = rnd.nextInt(10000).toLong; (100L + i, lo, lo + rnd.nextInt(800).toLong)
    }.toDF("iid", "lo", "hi")
    val expected = points.join(intervals, $"pt" >= $"lo" && $"pt" < $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    val got = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", 256L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    assert(got === expected && expected.nonEmpty)
  }

  test("binned range join handles empty and bin-boundary intervals") {
    val points = Seq((1L, 256L), (2L, 255L), (3L, 512L)).toDF("pid", "pt")
    // [256, 512): contains 256, not 255/512; [100,100) empty
    val intervals = Seq((10L, 256L, 512L), (11L, 100L, 100L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", 256L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))
  }

  // ---- BloomPrune ---------------------------------------------------------

  test("bloom-pruned semi join is exact (false positives re-filtered)") {
    val left = (1 to 5000).map(i => (i.toLong, s"v$i")).toDF("k", "payload")
    val right = (1 to 5000).filter(_ % 17 == 0).map(i => (i.toLong, i)).toDF("k", "x")
    val expected = left.join(right.select("k").distinct(), Seq("k"), "left_semi")
      .as[(Long, String)].collect().sorted
    val got = BloomPrune.semiJoin(left, right, "k", expectedItems = 1000L)
      .as[(Long, String)].collect().sorted
    assert(got === expected && got.length === 5000 / 17)
  }

  // ---- Sampling -----------------------------------------------------------

  test("split is disjoint-exhaustive, layout-independent, and ~proportional") {
    val a = (1L to 2000L).toDF("id").repartition(13)
    val b = (1L to 2000L).toDF("id").repartition(2).sort(desc("id"))
    def splits(df: org.apache.spark.sql.DataFrame) =
      Sampling.split(df, "id", Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
        .as[(Long, String)].collect().sorted.toSeq
    val sa = splits(a)
    assert(sa === splits(b))                       // layout-independent
    assert(sa.length === 2000)                     // exhaustive
    val counts = sa.groupBy(_._2).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 1600) < 100 &&
      math.abs(counts("val") - 200) < 60 && math.abs(counts("test") - 200) < 60)
  }

  test("sample(fraction) and stratified sampling are deterministic subsets") {
    val df = (1L to 1000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val s1 = Sampling.sample(df, "id", 0.3).as[(Long, String)].collect().toSet
    val s2 = Sampling.sample(df, "id", 0.3).as[(Long, String)].collect().toSet
    assert(s1 === s2 && math.abs(s1.size - 300) < 60)
    // a smaller fraction with the same salt is a SUBSET (nested samples)
    val s3 = Sampling.sample(df, "id", 0.1).as[(Long, String)].collect().toSet
    assert(s3.subsetOf(s1))
    val st = Sampling.stratified(df, "id", "lang", Map("en" -> 0.5))
      .as[(Long, String)].collect()
    assert(st.forall(_._2 == "en") && math.abs(st.length - 250) < 60)
  }

  test("kFold partitions rows into k balanced folds; kFoldSplit is disjoint-exhaustive") {
    val df = (1L to 2000L).toDF("id")
    val folds = Sampling.kFold(df, "id", 5).as[(Long, Int)].collect()
    assert(folds.length === 2000)
    assert(folds.forall { case (_, f) => f >= 0 && f < 5 })
    val sizes = folds.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.keySet === Set(0, 1, 2, 3, 4))
    assert(sizes.values.forall(s => math.abs(s - 400) < 100), s"unbalanced: $sizes")
    val (train, test) = Sampling.kFoldSplit(df, "id", 5, i = 2)
    val tr = train.as[Long].collect().toSet
    val te = test.as[Long].collect().toSet
    assert(tr.intersect(te).isEmpty)
    assert(tr.union(te) === (1L to 2000L).toSet)
    // same assignment as kFold: fold-2 rows are exactly the test side
    assert(te === folds.filter(_._2 == 2).map(_._1).toSet)
  }

  // ---- TextPipeline -------------------------------------------------------

  test("chunk: overlapping windows cover every token; short docs yield one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks
      (2L, "a b"), (3L, "")).toDF("id", "text")
    val got = TextPipeline.chunk(docs, "id", "text", chunkSize = 4, overlap = 1)
      .as[(Long, Int, String, Int)].collect().sortBy(c => (c._1, c._2))
    // stride 3: chunks at 0,3,6 cover tokens 1..10 (ceil((10-1)/3) = 3)
    assert(got.filter(_._1 == 1L).map(_._3).toSeq ===
      Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(got.filter(_._1 == 2L) === Seq((2L, 0, "a b", 2))) // short doc
    assert(!got.exists(_._1 == 3L))                           // empty doc
    // consecutive chunks share exactly `overlap` tokens
    val c1 = got(0)._3.split(" ").toSeq; val c2 = got(1)._3.split(" ").toSeq
    assert(c1.takeRight(1) === c2.take(1))
  }

  test("packBudget: bins hold ~budget tokens, deviation bounded by max doc") {
    val docs = (1 to 100).map(i => (i.toLong, 30 + (i * 7) % 50)).toDF("id", "n")
    val binned = TextPipeline.packBudget(docs, "id", "n", budget = 200L)
      .as[(Long, Int, Long)].collect()
    val byBin = binned.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val maxDoc = 79
    assert(byBin.values.forall(s => s <= 200 + maxDoc))
    assert(byBin.filterKeys(_ < byBin.keys.max).values.forall(s => s > 200 - maxDoc))
    // bins are contiguous in doc order
    val ordered = binned.sortBy(_._1).map(_._3)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => b - a == 0 || b - a == 1 })
  }

  test("packBudget: an oversized doc counts as one budget and starts a new bin") {
    val docs = Seq((1L, 50), (2L, 999), (3L, 50)).toDF("id", "n")
    val bins = TextPipeline.packBudget(docs, "id", "n", budget = 100L)
      .as[(Long, Int, Long)].collect().sortBy(_._1).map(_._3)
    // capped at budget: doc2 crosses exactly one boundary (no index blowup
    // from its true 999 tokens), and it never shares a bin with doc1
    assert(bins.toSeq === Seq(0L, 1L, 1L))
  }

  test("scrubPii masks emails, IPs, digit runs and counts each") {
    val df = Seq((1L,
      "mail a.b+c@ex-ample.org and 10.0.0.1 then call 555-123-4567 ok")).toDF("id", "text")
    val r = TextPipeline.scrubPii(df, "text")
      .select("clean_text", "n_emails", "n_ips", "n_numbers")
      .as[(String, Int, Int, Int)].collect().head
    assert(r._1 === "mail <EMAIL> and <IP> then call <NUMBER> ok")
    assert((r._2, r._3, r._4) === (1, 1, 1))
  }

  test("unigramLogProb ranks common-token docs above rare-token docs") {
    val docs = Seq(
      (1L, "the the the the the"),
      (2L, "the of and to in"),
      (3L, "zxqv wvut qqpl mnbv")).toDF("id", "text")
    val scores = TextPipeline.unigramLogProb(docs, "id", "text")
      .as[(Long, Double, Long)].collect().map(t => t._1 -> t._2).toMap
    assert(scores(1L) > scores(2L) && scores(2L) > scores(3L))
  }

  // ---- closed-form regression ---------------------------------------------

  test("linearFit recovers exact coefficients per group, any partitioning") {
    // y = 3x + 7 exactly for group a; y = -2x + 100 for group b
    val rows = (1 to 500).flatMap(i =>
      Seq(("a", i.toLong, 3L * i + 7), ("b", i.toLong, -2L * i + 100)))
    def fit(parts: Int) = graft.operators.Preprocessing
      .linearFit(rows.toDF("g", "x", "y").repartition(parts), Seq("g"), "x", "y")
      .select($"g", $"slope", $"intercept").as[(String, Double, Double)]
      .collect().sortBy(_._1).toSeq
    val f = fit(7)
    assert(f === Seq(("a", 3.0, 7.0), ("b", -2.0, 100.0)))
    assert(f === fit(2)) // exact moments: partitioning cannot change bits
  }

  // ---- z-order layout -----------------------------------------------------

  test("zorderBy bounds per-partition spread on EVERY clustered column") {
    import graft.operators.Partitioning
    val rnd = new scala.util.Random(11)
    val df = (1 to 4096).map(_ => (rnd.nextInt(1000), rnd.nextInt(1000)))
      .toDF("x", "y")
    def spans(d: org.apache.spark.sql.DataFrame, c: String): Seq[Long] =
      d.select(col(c).cast("long"), spark_partition_id().as("p"))
        .groupBy("p").agg((max(c) - min(c)).as("span"))
        .select("span").as[Long].collect().toSeq
    val zed = Partitioning.zorderBy(df, 16, Seq("x", "y")).cache()
    assert(zed.count() === 4096)                       // nothing lost
    val linear = df.repartitionByRange(16, $"x").cache()
    val zx = spans(zed, "x"); val zy = spans(zed, "y")
    val lx = spans(linear, "x"); val ly = spans(linear, "y")
    def avg(s: Seq[Long]) = s.sum.toDouble / s.size
    // linear: x tightly bounded, y unbounded (~full range per partition)
    assert(avg(lx) < 200 && avg(ly) > 800)
    // z-order: BOTH columns bounded well below full range — min/max file
    // stats can prune selective scans on either column
    assert(avg(zx) < 600 && avg(zy) < 600,
      s"z spans x=${avg(zx)} y=${avg(zy)} not both bounded")
    zed.unpersist(); linear.unpersist()
  }

  // ---- incremental dedup --------------------------------------------------

  test("dedupSpans keeps only first corpus occurrence; docs rebuild in order") {
    val span = (1 to 10).map(i => s"b$i").mkString(" ")   // shared boilerplate
    val u1 = (1 to 10).map(i => s"x$i").mkString(" ")
    val u2 = (1 to 10).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span $u1"),        // first occurrence of span: keeps both
      (2L, s"$u2 $span"),        // later occurrence: span dropped, u2 kept
      (3L, span)).toDF("doc_id", "text") // all spans dropped -> empty text
    val got = TextPipeline.dedupSpans(docs, "doc_id", "text", spanTokens = 10)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got(0) === ((1L, s"$span $u1", 2L, 0L)))
    assert(got(1) === ((2L, u2, 1L, 1L)))
    assert(got(2) === ((3L, "", 0L, 1L)))
  }

  test("dropFrequentSpans removes EVERY copy of an over-frequent span — " +
    "first occurrence included — and flags mostly-boilerplate docs dropped") {
    val span = (1 to 10).map(i => s"b$i").mkString(" ")   // corpus boilerplate
    val u1 = (1 to 10).map(i => s"x$i").mkString(" ")
    val u2 = (1 to 10).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span $u1"), // loses the span (unlike dedupSpans' keep-first)
      (2L, s"$u2 $span"),
      (3L, span)          // 100% boilerplate -> doc_dropped
    ).toDF("doc_id", "text")
    val got = TextPipeline.dropFrequentSpans(docs, "doc_id", "text",
        spanTokens = 10, maxOcc = 1, maxRemovedFrac = 0.5)
      .select("doc_id", "n_spans", "n_removed", "text_clean", "doc_dropped")
      .as[(Long, Long, Long, String, Boolean)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 2L, 1L, u1, false)))
    assert(got(1) === ((2L, 2L, 1L, u2, false)))
    assert(got(2) === ((3L, 1L, 1L, "", true)))
    // at maxOcc = 3 the span (3 occurrences) survives everywhere
    val lax = TextPipeline.dropFrequentSpans(docs, "doc_id", "text",
        spanTokens = 10, maxOcc = 3, maxRemovedFrac = 0.5)
      .agg(org.apache.spark.sql.functions.sum("n_removed")).head().getLong(0)
    assert(lax === 0L)
  }

  test("perplexityBuckets: per-language thirds, head = highest " +
    "log-probability, bigram-less docs sink to tail") {
    // lang A: six docs — three fluent (repeated common bigrams), two rare
    // soups, one single-token doc (no bigrams at all -> sentinel -> tail)
    val fluent = "the cat sat on the mat and the cat sat again"
    val docs = Seq(
      (1L, fluent, "A"), (2L, fluent, "A"), (3L, s"$fluent the cat", "A"),
      (4L, "zq xv jk wp qm lz", "A"), (5L, "vv uu tt ss rr qq", "A"),
      (6L, "solitary", "A"),
      (11L, fluent, "B"), (12L, "aa bb cc dd", "B"), (13L, "ee ff gg", "B")
    ).toDF("doc_id", "text", "lang")
    val got = TextPipeline.perplexityBuckets(docs, "doc_id", "text", "lang")
      .select("doc_id", "lang", "ppl_bucket")
      .as[(Long, String, String)].collect().map(r => r._1 -> r._3).toMap
    // lang A: ntile(3) over 6 docs = 2/2/2; the bigram-less doc is tail
    assert(got(6L) === "tail")
    assert(Seq(1L, 2L, 3L).map(got).count(_ == "head") === 2,
      "the fluent docs must fill the head bucket")
    assert(Seq(4L, 5L).map(got).forall(b => b == "middle" || b == "tail"),
      "rare-token soup must not reach head")
    // lang B buckets independently: 3 docs -> one per bucket
    assert(Seq(11L, 12L, 13L).map(got).sorted === Seq("head", "middle", "tail"))
  }

  test("perplexityBuckets rank-arithmetic form equals the ntile window " +
    "reference on a ONE-language corpus (the scale case it exists for)") {
    val words = Seq("the", "cat", "sat", "on", "mat", "dog", "ran", "far",
      "zq", "xv", "jk", "wp")
    val rnd = new scala.util.Random(41)
    val docs = (0 until 55).map { i =>
      val n = 1 + rnd.nextInt(9)
      (i.toLong, (0 until n).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" "), "only")
    }.toDF("doc_id", "text", "lang")
    val got = TextPipeline.perplexityBuckets(docs, "doc_id", "text", "lang")
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    // reference: the group-keyed ntile window this operator replaced
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(coalesce(round(col("logprob"), 6), lit(-1e18)).desc, col("doc_id"))
    val want = docs.select(col("doc_id"), col("lang"))
      .join(TextPipeline.kneserNeyBigramLogProb(docs, "doc_id", "text"),
        Seq("doc_id"))
      .withColumn("_nt", ntile(3).over(win))
      .select(col("doc_id"),
        when(col("_nt") === 1, "head").when(col("_nt") === 2, "middle")
          .otherwise("tail").as("b"))
      .as[(Long, String)].collect().toMap
    assert(got === want)
  }

  test("c4LineFilter: hand-built pages — terminal punctuation, word " +
    "minimum, javascript screen, page-level drops") {
    val good = "this line has plenty of words and ends well."
    val docs = Seq(
      // 3 good sentences -> kept page
      (1L, s"$good\n$good\n$good"),
      // unpunctuated + short lines die; < 3 sentences -> dropped page
      (2L, s"no terminal punctuation on this long line\nshort one.\n$good"),
      // javascript line dies even with punctuation and words
      (3L, s"$good\nplease enable JavaScript to continue reading this."
        + s"\n$good\n$good"),
      // lorem ipsum / brace pages drop regardless of line survival
      (4L, s"$good\n$good\n$good\nlorem ipsum dolor sit amet."),
      (5L, s"$good\n$good\n$good\nvar x = { a: 1 };"),
      // end-quotation counts as terminal punctuation
      (6L, "he said \"this quoted line has enough words here.\"\n"
        + s"$good\n$good")
    ).toDF("doc_id", "text")
    val got = TextPipeline.c4LineFilter(docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, s"$good\n$good\n$good", 3L, 3L, 3L, false)))
    // doc 2: only the last line survives -> 1 sentence -> dropped
    assert(got(2L)._2 === good && got(2L)._4 === 1L && got(2L)._6 === true)
    // doc 3: javascript line excised, the 3 good ones survive
    assert(got(3L)._4 === 3L && !got(3L)._2.toLowerCase.contains("javascript")
      && got(3L)._6 === false)
    assert(got(4L)._6 === true, "lorem ipsum page must drop")
    assert(got(5L)._6 === true, "brace page must drop")
    // doc 6: the quoted line is kept (ends in \"), page survives
    assert(got(6L)._4 === 3L && got(6L)._6 === false)
  }

  test("c4LineFilter differential fuzz: random pages vs a scala replay " +
    "of the published rules") {
    val rnd = new scala.util.Random(61)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "javascript", "JavaScript")
    val tails = Seq(".", "!", "?", "\"", "", " ", "x")
    val docs = (0 until 120).map { i =>
      val nLines = rnd.nextInt(6)
      val lines = (0 until nLines).map { _ =>
        val n = rnd.nextInt(8)
        (0 until n).map(_ => words(rnd.nextInt(words.size))).mkString(" ") +
          tails(rnd.nextInt(tails.size))
      }
      val extra = rnd.nextInt(10) match {
        case 0 => " lorem ipsum "
        case 1 => " { "
        case _ => ""
      }
      (i.toLong, lines.mkString("\n") + extra)
    }
    val got = TextPipeline.c4LineFilter(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    docs.foreach { case (id, text) =>
      val lines = text.split("\n", -1).toSeq
      val kept = lines.filter { l =>
        l.nonEmpty && ".!?\"".contains(l.last) &&
          l.split("\\s+").count(_.nonEmpty) >= 5 &&
          !l.toLowerCase.contains("javascript")
      }
      val clean = kept.mkString("\n")
      val ns = clean.count(c => c == '.' || c == '!' || c == '?').toLong
      val dropped = text.toLowerCase.contains("lorem ipsum") ||
        text.contains("{") || ns < 3
      assert(got(id) === ((id, clean, lines.size.toLong, kept.size.toLong,
        ns, dropped)), s"doc $id: ${text.take(80)}")
    }
  }

  test("contaminationCheck counts shared n-grams; clean docs report zero") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a sentence with the quick brown fox inside it"), // shares 3-grams
      (2L, "nothing in common with anything here")).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .contaminationCheck(train, bench, "doc_id", "text", n = 3)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    // "the quick brown" and "quick brown fox" are the shared 3-grams
    assert(got.toSeq === Seq((1L, 2L, true), (2L, 0L, false)))
  }

  test("prefix-filtered Jaccard equals the full inverted-index result") {
    val rnd = new scala.util.Random(23)
    val vocab = (1 to 60).map(i => s"w$i")
    def doc() = (1 to 12).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // random docs plus planted near-dup pairs
    val base = (1 to 60).map(i => (i.toLong, doc()))
    val dups = base.take(8).map { case (id, t) =>
      (1000L + id, t.split(" ").dropRight(1).mkString(" ") + " w1") }
    val docs = (base ++ dups).toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.7)) {
      val full = Dedup.jaccardPairs(docs, "doc_id", "text", n = 2, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      val pfx = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", n = 2, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(pfx === full, s"prefix filter lost/added pairs at t=$t")
      assert(full.nonEmpty, s"degenerate test corpus at t=$t")
    }
  }

  test("minhashNewVsCorpus finds cross-side near-dups only, exact-verified") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq((1L, base), (2L, "completely different text about spark plans"),
      (3L, base + " slightly")).toDF("doc_id", "text")  // 1 and 3 near-dup: intra-corpus, must NOT appear
    val incoming = Seq((10L, base + " extra"), (11L, "nothing like anything here at all"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashNewVsCorpus(incoming, corpus, "doc_id", "text",
      n = 2, k = 128, bands = 64, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2)).toSet
    assert(got === Set((10L, 1L), (10L, 3L)))
  }

  // ---- TF-IDF / BM25 ------------------------------------------------------

  test("tfidfTopTerms: hand-checked scores, rank order, and tie-break") {
    // N=3; "rare" only in doc 1 (df=1), "shared" in all (df=3)
    val docs = Seq(
      (1L, "rare shared shared"),
      (2L, "shared common common"),
      (3L, "shared common zed")).toDF("doc_id", "text")
    val got = TextPipeline.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, Int, String, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2))
    def score(tf: Long, df: Long) =
      BigDecimal(tf * (math.log(4.0 / (df + 1)) + 1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: shared tf=2 df=3 -> 2*(ln(1)+1)=2.0 beats rare tf=1 df=1 -> ln(2)+1
    assert(got.filter(_._1 == 1L).map(r => (r._2, r._3, r._6)).toSeq ===
      Seq((1, "shared", score(2, 3)), (2, "rare", score(1, 1))))
    // doc 2: common tf=2 df=2 beats shared tf=1 df=3
    assert(got.filter(_._1 == 2L).map(r => (r._2, r._3)).toSeq ===
      Seq((1, "common"), (2, "shared")))
    // doc 3: all three terms tie at tf=1 only on score when scores equal;
    // here zed (df=1) > common (df=2) > shared (df=3); k=2 keeps first two
    assert(got.filter(_._1 == 3L).map(r => (r._2, r._3)).toSeq ===
      Seq((1, "zed"), (2, "common")))
  }

  test("tfidfTopTerms ranks on the ROUNDED score with term-ascending ties") {
    // two terms with identical tf and df in one doc -> identical scores;
    // the tie must break alphabetically for engine-portable ranking
    val docs = Seq((1L, "beta alpha"), (2L, "alpha beta filler")).toDF("doc_id", "text")
    val got = TextPipeline.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, Int, String, Long, Long, Double)].collect()
      .filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    assert(got === Seq("alpha", "beta"))
  }

  test("bm25Rank: hand-computed Okapi score, matched docs only") {
    val docs = Seq(
      (1L, "hash join hash scan"),   // dl=4, tf(hash)=2, tf(join)=1
      (2L, "scan filter sort scan"), // no query terms -> absent from output
      (3L, "join line")).toDF("doc_id", "text") // dl=2, tf(join)=1
    val got = TextPipeline.bm25Rank(docs, "doc_id", "text", Seq("hash", "join"))
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    val n = 3.0; val avgdl = 10.0 / 3
    def idf(df: Long) = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def c(tf: Long, df: Long, dl: Long) =
      idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1).toSeq === Seq(1L, 3L))
    assert(got.map(_._3).toSeq === Seq(2L, 1L))          // n_matched terms
    assert(got(0)._2 === r6(c(2, 1, 4) + c(1, 2, 4)))    // doc 1: hash + join
    assert(got(1)._2 === r6(c(1, 2, 2)))                 // doc 3: join only
  }

  test("bm25Rank lowercases query terms and text consistently") {
    val docs = Seq((1L, "Hash HASH hash")).toDF("doc_id", "text")
    val got = TextPipeline.bm25Rank(docs, "doc_id", "text", Seq("HASH"))
      .as[(Long, Double, Long)].collect()
    assert(got.length == 1 && got(0)._3 == 1L)
  }

  // ---- mixture / priority sampling ---------------------------------------

  test("mixtureBudgets: sqrt-temperature weights, integer budgets, sum <= total") {
    // groups of 100 / 25 / 4 docs -> weights 10 / 5 / 2, sum 17
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 125).map(i => (i.toLong, "mid")) ++
      (126 to 129).map(i => (i.toLong, "small")))
      .toDF("doc_id", "lang")
    val got = Sampling.mixtureBudgets(df, "lang", totalBudget = 17L)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("big", 100L, 10L, 10L), ("mid", 25L, 5L, 5L),
      ("small", 4L, 2L, 2L)))
    // alpha = 0.5 flattens: big is 25x small by count, only 5x by budget
  }

  test("mixtureSample exact: exactly budget_g rows per group, hash-deterministic") {
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 125).map(i => (i.toLong, "mid"))).toDF("doc_id", "lang")
    // weights 10/5, budget 30 -> 20/10
    val got = Sampling.mixtureSample(df, "doc_id", "lang", totalBudget = 30L)
    val byG = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byG === Map("big" -> 20L, "mid" -> 10L))
    // deterministic: a second run selects the identical id set
    val ids1 = got.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Sampling.mixtureSample(df, "doc_id", "lang", totalBudget = 30L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 === ids2)
  }

  test("mixtureSample fractional: map-side, budget hit in expectation") {
    val df = (1 to 1000).map(i => (i.toLong, "only")).toDF("doc_id", "lang")
    // single group: weight=31, budget=200 -> fraction 0.2
    val n = Sampling.mixtureSample(df, "doc_id", "lang", totalBudget = 200L,
      exact = false).count()
    assert(n > 140 && n < 260) // Bernoulli(0.2) over 1000, ±6 sigma
  }

  test("prioritySample: inclusion tracks weight; zero-weight rows never win") {
    val df = ((1 to 200).map(i => (i.toLong, 1000L)) ++     // heavy
      (201 to 400).map(i => (i.toLong, 1L)) ++              // light
      (401 to 410).map(i => (i.toLong, 0L))).toDF("doc_id", "w") // zero
    val got = Sampling.prioritySample(df, "doc_id", "w", k = 50)
      .select("doc_id", "w").as[(Long, Long)].collect()
    assert(got.length === 50)
    assert(got.forall(_._2 > 0L))
    // weight ratio 1000:1 -> heavies dominate the top-50 overwhelmingly
    assert(got.count(_._2 == 1000L) >= 45)
  }

  // ---- boilerplate removal ------------------------------------------------

  test("removeBoilerplate drops EVERY occurrence of a high-df span, keeps rare ones") {
    val banner = "one two three four" // spanTokens = 4, aligned at pos 0
    val docs = (1 to 6).map(i => (i.toLong, s"$banner uniq$i pad$i tail$i end$i")) :+
      (7L, "rare span here now uniq7 pad7 tail7 end7") :+
      (8L, "rare span here now uniq8 pad8 tail8 end8")
    val df = docs.toDF("doc_id", "text")
    val got = TextPipeline.removeBoilerplate(df, "doc_id", "text",
      spanTokens = 4, maxDf = 5)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // banner df=6 > 5 -> removed from all six docs; rare df=2 stays
    (1 to 6).foreach { i =>
      val r = got(i - 1)
      assert(r._2 === s"uniq$i pad$i tail$i end$i" && r._4 === 1L)
    }
    assert(got(6)._2.startsWith("rare span here now") && got(6)._4 === 0L)
    assert(got(7)._2.startsWith("rare span here now") && got(7)._4 === 0L)
  }

  test("removeBoilerplate counts distinct DOCS, not occurrences") {
    // the span repeats 10 times but inside ONE doc -> df=1, kept
    val df = Seq((1L, Array.fill(10)("a b c d").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextPipeline.removeBoilerplate(df, "doc_id", "text",
      spanTokens = 4, maxDf = 5).as[(Long, String, Long, Long)].collect()
    assert(got(0)._4 === 0L && got(0)._3 === 10L)
  }

  // ---- BPE ---------------------------------------------------------------

  test("bpePairStats: weighted adjacent-pair counts with </w> marker") {
    // "ab ab cd" -> words ab(x2), cd(x1); pairs: a+b:2, b+</w>:2, c+d:1, d+</w>:1
    val df = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val got = TextPipeline.bpePairStats(df, "text", k = 10)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "a", "b", 2L), (2, "b", "</w>", 2L),
      (3, "c", "d", 1L), (4, "d", "</w>", 1L)))
  }

  test("bpeTrain: the classic low/lower merge sequence") {
    // corpus: low x5, lower x2 — BPE first fuses l+o (7), then lo+w (7)
    val df = Seq((1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")))
      .toDF("doc_id", "text")
    val merges = TextPipeline.bpeTrain(df, "text", nMerges = 3)
    assert(merges.map(m => (m._2, m._3)) === Seq(
      ("l", "o"), ("lo", "w"), ("low", "</w>")))
    assert(merges.map(_._4) === Seq(7L, 7L, 5L))
  }

  test("bpeTrain merge application is greedy leftmost (aaa + a+a -> [aa, a])") {
    // word 'aaaa' x3, 'aaa' x2: round 1 pair a+a counts 3*3 + 2*2 = 13;
    // greedy rewrite gives aaaa -> [aa, aa], aaa -> [aa, a]
    val df = Seq((1L, (Seq.fill(3)("aaaa") ++ Seq.fill(2)("aaa")).mkString(" ")))
      .toDF("doc_id", "text")
    val merges = TextPipeline.bpeTrain(df, "text", nMerges = 2)
    assert(merges(0)._2 == "a" && merges(0)._3 == "a" && merges(0)._4 == 13L)
    // round 2: sequences are [aa,aa,</w>] x3 and [aa,a,</w>] x2 ->
    // aa+aa: 3, aa+a: 2, aa+</w>: 3, a+</w>: 2 -> argmax ties aa+aa / aa+</w>
    // at 3; lexicographic tie-break picks aa+</w> ('<' sorts before 'a')
    assert(merges(1)._2 == "aa" && merges(1)._3 == "</w>" && merges(1)._4 == 3L)
  }

  test("bpeTrainBatched: batch=1 is exactly bpeTrain; bigger batches are " +
    "non-overlapping per round and deterministic") {
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(3)("widest") ++ Seq.fill(4)("newest")).mkString(" ")
    val df = Seq((1L, corpus)).toDF("doc_id", "text")
    val serial = TextPipeline.bpeTrain(df, "text", nMerges = 6)
    val b1 = TextPipeline.bpeTrainBatched(df, "text", nMerges = 6, batch = 1)
    assert(b1 === serial)
    val b4 = TextPipeline.bpeTrainBatched(df, "text", nMerges = 8, batch = 4)
    assert(b4.size === 8)
    // within each round's batch, no symbol participates in two merges —
    // string-level rule (round-9 hardening): a pair's fused OUTPUT l+r
    // must not collide with any other selected pair's input or output
    b4.groupBy(_._1).foreach { case (r, round) =>
      val syms = round.flatMap(m => Seq(m._2, m._3))
      val outs = round.map(m => m._2 + m._3)
      assert(syms.distinct.size === syms.size, s"overlap in round $r: $round")
      assert(outs.intersect(syms).isEmpty,
        s"output/input collision in round $r: $round")
      assert(outs.distinct.size === outs.size)
    }
    // deterministic replay
    assert(TextPipeline.bpeTrainBatched(df, "text", nMerges = 8, batch = 4) === b4)
    // single-symbol collapse guard holds under batching too (word 'a')
    val tiny = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val tm = TextPipeline.bpeTrainBatched(tiny, "text", nMerges = 4, batch = 2)
    assert(tm.nonEmpty) // merges (a,</w>) then 'a' collapses to one symbol
  }

  test("wordpieceTrain: likelihood argmax diverges from BPE, score tie falls " +
    "to pair count") {
    // corpus: la x6, xy x1. Round 1 scores (scale 1e9): (x,y) = 1e9/(1·1)
    // beats (l,a) = 6e9/36 — WordPiece fuses the RARE-unit pair BPE would
    // never pick first (BPE takes (l,a) at count 6). Round 3 then ties
    // (la,</w>) and (xy,</w>) at floor(·) = 142857142; pc DESC breaks it.
    val df = Seq((1L, (Seq.fill(6)("la") ++ Seq("xy")).mkString(" ")))
      .toDF("doc_id", "text")
    val wp = TextPipeline.wordpieceTrain(df, "text", nMerges = 3)
    assert(wp === Seq(
      (1, "x", "y", 1L, 1000000000L),
      (2, "l", "a", 6L, 166666666L),
      (3, "la", "</w>", 6L, 142857142L)))
    // BPE's count argmax ties (l,a)/(a,</w>) at 6 and lexicographically
    // takes (a,</w>) — either way, never round-1 (x,y)
    val bpe = TextPipeline.bpeTrain(df, "text", nMerges = 1)
    assert((bpe.head._2, bpe.head._3) === ("a", "</w>"))
  }

  test("wordpieceEncode: longest-match-first, ## continuations, greedy " +
    "UNK even when a shorter split would segment") {
    // vocab: init {abc, ab, x}, cont {##cx, ##d}
    //  abcd -> abc + ##d = 2 tokens
    //  abcx -> greedy takes abc, then 'x' has no continuation -> UNK(1),
    //          even though ab + ##cx would segment (BERT semantics)
    //  x    -> 1 token; q7 -> UNK (no 'q' piece)
    val vocab = Seq("abc", "ab", "x", "##cx", "##d")
    val df = Seq((1L, "abcd abcx x"), (2L, "q7 abcd abcd")).toDF("doc_id", "text")
    val got = TextPipeline.wordpieceEncode(df, "doc_id", "text", vocab)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 2L + 1L + 1L, 1L), (2L, 3L, 1L + 2L + 2L, 1L)))
  }

  test("wordpieceEncodeTrie equals the inline fold: fixed cases, randomized " +
    "vocab/corpus, and non-BMP code points") {
    def both(df: org.apache.spark.sql.DataFrame, vocab: Seq[String]) = (
      TextPipeline.wordpieceEncode(df, "doc_id", "text", vocab)
        .as[(Long, Long, Long, Long)].collect().toSet,
      TextPipeline.wordpieceEncodeTrie(df, "doc_id", "text", vocab)
        .as[(Long, Long, Long, Long)].collect().toSet)
    // the greedy-dead-end fixture from the inline test
    val v1 = Seq("abc", "ab", "x", "##cx", "##d")
    val d1 = Seq((1L, "abcd abcx x"), (2L, "q7 abcd abcd")).toDF("doc_id", "text")
    val (i1, t1) = both(d1, v1)
    assert(t1 === i1 && i1.nonEmpty)
    // randomized: words and pieces over a tiny alphabet maximize both
    // collision and dead-end density
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 4) {
      val letters = "abc"
      def piece() = Seq.fill(1 + rnd.nextInt(3))(
        letters(rnd.nextInt(letters.length))).mkString
      val vocab = (Seq.fill(6)(piece()) ++ Seq.fill(6)("##" + piece())).distinct
      def word() = Seq.fill(1 + rnd.nextInt(6))(
        letters(rnd.nextInt(letters.length))).mkString
      val docs = (1L to 6L).map(i => (i, Seq.fill(8)(word()).mkString(" ")))
        .toDF("doc_id", "text")
      val (inl, tri) = both(docs, vocab)
      assert(tri === inl, s"trial $trial diverged (vocab=$vocab)")
    }
    // code-point stepping: surrogate-pair pieces must match whole
    val smile = new String(Character.toChars(0x1F600))
    val v2 = Seq(smile, "##" + smile, "a", "##a")
    val d2 = Seq((1L, s"$smile$smile a$smile ${smile}a aa b"))
      .toDF("doc_id", "text")
    val (i2, t2) = both(d2, v2)
    assert(t2 === i2 && i2.nonEmpty)
  }

  test("minTokenEncode: DP segments greedy's dead ends and never uses more " +
    "tokens") {
    val vocab = Seq("abc", "ab", "x", "a", "##cx", "##d", "##b", "##c")
    //  abcx: greedy abc->dead end (UNK); DP: ab + ##cx = 2
    //  abcd: both 2 (abc+##d; DP can't beat 2)
    //  aaaa: greedy would be a,##? no ##a piece -> UNK; DP also UNK
    val df = Seq((1L, "abcx abcd aaaa")).toDF("doc_id", "text")
    val dp = TextPipeline.minTokenEncode(df, "doc_id", "text", vocab)
      .as[(Long, Long, Long, Long)].collect().head
    assert(dp === ((1L, 3L, 2L + 2L + 1L, 1L)))
    val greedy = TextPipeline.wordpieceEncode(df, "doc_id", "text", vocab)
      .as[(Long, Long, Long, Long)].collect().head
    assert(greedy === ((1L, 3L, 1L + 2L + 1L, 2L))) // abcx is UNK under greedy
  }

  test("kneserNeyBigramLogProb: hand-computed D=3/4 model; discount mass " +
    "flows to continuation counts") {
    // "a b a b a c": bigrams (a,b)x2 (b,a)x2 (a,c)x1
    // ca: a=3 b=2; n1a: a=2 b=1; n1b: a=1 b=1 c=1; N=3 types
    // P(b|a) = ((4*2-3)*3 + 3*2*1)/(4*3*3) = 21/36
    // P(a|b) = ((4*2-3)*3 + 3*1*1)/(4*2*3) = 18/24
    // P(c|a) = ((4*1-3)*3 + 3*2*1)/(4*3*3) =  9/36
    val df = Seq((1L, "a b a b a c"), (2L, "solo")).toDF("doc_id", "text")
    val got = TextPipeline.kneserNeyBigramLogProb(df, "doc_id", "text")
      .as[(Long, Option[Double], Long)].collect()
      .map { case (k, p, n) => k -> ((p, n)) }.toMap
    val expected = (2 * math.log(21.0 / 36) + 2 * math.log(18.0 / 24) +
      math.log(9.0 / 36)) / 5
    assert(math.abs(got(1L)._1.get - expected) < 1e-9)
    assert(got(1L)._2 === 5L)
    assert(got(2L) === ((None, 0L))) // one token -> no bigram evidence
    // rarer continuation scores BELOW the frequent one under the same
    // left context (the property add-one shares but KN sharpens)
    assert(math.log(9.0 / 36) < math.log(21.0 / 36))
  }

  test("minCostEncode: weighted DP trades more pieces for lower total cost") {
    // word "abcd": fewest-tokens picks abc+##d (2 pieces, cost 100+1);
    // the weighted DP picks ab+##c+##d (3 pieces, cost 10+10+1=21)
    val vocab = Seq("ab" -> 10L, "abc" -> 100L, "##c" -> 10L, "##d" -> 1L)
    val df = Seq((1L, "abcd zz")).toDF("doc_id", "text")
    val got = TextPipeline.minCostEncode(df, "doc_id", "text", vocab,
        unkCost = 777L)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((1L, 2L, 21L + 777L, 1L))) // zz is UNK at the flat cost
    // uniform costs reproduce minTokenEncode exactly
    val uni = TextPipeline.minCostEncode(df, "doc_id", "text",
        vocab.map(_._1 -> 1L), unkCost = 1L)
      .as[(Long, Long, Long, Long)].collect().head
    assert(uni === ((1L, 2L, 2L + 1L, 1L)))
  }

  test("minCostEncode: -log-prob-scale costs above the old 1e9 sentinel " +
    "still segment") {
    // two pieces at 6e8 sum to 1.2e9 — past the historical fixed INF, so
    // this word used to misreport as one UNK at unkCost; the sentinel now
    // derives from the vocabulary's max cost
    val vocab = Seq("ab" -> 600000000L, "##ab" -> 600000000L)
    val df = Seq((1L, "abab")).toDF("doc_id", "text")
    val got = TextPipeline.minCostEncode(df, "doc_id", "text", vocab,
        unkCost = 5L)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((1L, 1L, 1200000000L, 0L)))
  }

  test("bigramLogProb: hand-computed add-one model, short-doc null policy") {
    // corpus: "a b" x2, "a c" x1, "x" x1 → unigrams a:3 b:2? no —
    // tokens: doc1 "a b a b" (a:2,b:2), doc2 "a c" (a:1,c:1), doc3 "x".
    // V = 4 (a,b,c,x). bigram counts: (a,b):2, (b,a):1, (a,c):1.
    // P(b|a) = (2+1)/(3+4) = 3/7; P(a|b) = (1+1)/(2+4) = 2/6; P(c|a) = (1+1)/(3+4) = 2/7.
    val df = Seq((1L, "a b a b"), (2L, "a c"), (3L, "x")).toDF("doc_id", "text")
    val got = TextPipeline.bigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val d1 = got(0)
    // doc1 bigrams: (a,b),(b,a),(a,b) → avg(ln(3/7), ln(2/6), ln(3/7))
    val exp1 = (2 * math.log(3.0 / 7) + math.log(2.0 / 6)) / 3
    assert(d1.getLong(0) == 1L && math.abs(d1.getDouble(1) - exp1) < 1e-12
      && d1.getLong(2) == 3L)
    val d2 = got(1)
    assert(d2.getLong(0) == 2L
      && math.abs(d2.getDouble(1) - math.log(2.0 / 7)) < 1e-12
      && d2.getLong(2) == 1L)
    // single-token doc: no bigram evidence → null score, 0 bigrams
    val d3 = got(2)
    assert(d3.getLong(0) == 3L && d3.isNullAt(1) && d3.getLong(2) == 0L)
  }

  test("char decomposition splits by CODE POINT on non-BMP text (oracle " +
    "alignment pin for qd2/qd4)") {
    // Spark split(s, '') advances the Java regex engine per code point
    // (surrogate pairs stay whole since Java 8); DuckDB word[i] indexes
    // UTF-8 characters == code points — so both engines agree on
    // supplementary-plane text. Pin it so a Spark/Java behavior change
    // can't silently skew the BPE oracles on emoji/CJK-ext corpora.
    val df = Seq((1L, "a😀b 汉𠀀字")).toDF("doc_id", "text")
    val got = df.select(split(col("text"), " ").as("w"))
      .select(explode(col("w")).as("word"))
      .select(col("word"), split(col("word"), "").as("chars"))
      .orderBy("word").as[(String, Seq[String])].collect().toSeq
    assert(got === Seq(
      ("a😀b", Seq("a", "😀", "b")),
      ("汉𠀀字", Seq("汉", "𠀀", "字"))))
    // and the BPE pair device sees code-point symbols, not surrogate halves
    val pairs = TextPipeline.bpePairStats(df.limit(1), "text", k = 20)
      .as[(Int, String, String, Long)].collect()
    assert(pairs.exists(p => p._2 == "a" && p._3 == "😀"))
    assert(pairs.exists(p => p._2 == "𠀀" && p._3 == "字"))
  }

  test("bpeEncode applies merges in rank order, greedy-leftmost, per word instance") {
    val docs = Seq((1L, "aa ab aa"), (2L, "b")).toDF("doc_id", "text")
    // merge 1 fuses (a,a); merge 2 fuses the RESULT with the end marker —
    // rank order matters: (aa,</w>) can only fire after (a,a) produced 'aa'
    val got = TextPipeline.bpeEncode(docs, "doc_id", "text",
        Seq(("a", "a"), ("aa", "</w>")))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // doc 1: aa -> [a,a,</w>] -> [aa,</w>] -> [aa</w>] = 1 token (×2 instances)
    //        ab -> [a,b,</w>] = 3 tokens (no merge applies)
    assert(got(1L) === ((3L, 1L + 3L + 1L)))
    // doc 2: b -> [b,</w>] = 2 tokens
    assert(got(2L) === ((1L, 2L)))
    // encode with the merges bpeTrain learns == train-side final vocabulary
    val merges = TextPipeline.bpeTrain(docs, "text", nMerges = 2)
      .map { case (_, l, r, _) => (l, r) }
    val enc = TextPipeline.bpeEncode(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect()
    assert(enc.length === 2 && enc.forall(t => t._3 >= t._2)) // ≥1 token/word
  }

  test("bpeEncode survives a 48-merge list (analyzer/codegen depth guard)") {
    // 47 inapplicable merges deepen the nested fold expression without
    // changing results; the final applicable merge must still fire after
    // them — pins the depth regime the scaladoc's batching note starts at
    val docs = Seq((1L, "abc abc")).toDF("doc_id", "text")
    val merges = (1 to 47).map(i => (s"zz$i", s"yy$i")) :+ ("a", "b")
    val got = TextPipeline.bpeEncode(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect()
    // abc -> [ab, c, </w>] = 3 tokens per instance, 2 instances
    assert(got.toSeq === Seq((1L, 2L, 6L)))
  }

  // ---- fill-in-the-middle -------------------------------------------------

  test("fimTransform: PSM reassembly restores the original tokens, cuts " +
    "stay in bounds, rate=0/1 gates everything off/on") {
    val docs = (1L to 40L).map(i =>
      (i, (1 to (i % 7).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextPipeline.fimTransform(docs, "doc_id", "text", rate = 0.5)
      .as[(Long, Boolean, Long, Long, Long, String)].collect()
    assert(out.length === 40)
    val orig = docs.as[(Long, String)].collect().toMap
    out.foreach { case (id, applied, n, lo, hi, text) =>
      val toks = orig(id).split("\\s+").filter(_.nonEmpty).toSeq
      assert(n === toks.length.toLong)
      assert(0L <= lo && lo <= hi && hi <= n, s"doc $id cuts out of bounds")
      if (applied) {
        // parse "<PRE> p <SUF> s <MID> m" and reassemble p + m + s
        val pre = text.indexOf("<PRE> "); val suf = text.indexOf(" <SUF> ")
        val mid = text.indexOf(" <MID> ")
        assert(pre === 0 && suf > 0 && mid > suf, s"doc $id bad layout: $text")
        val p = text.substring(6, suf); val sfx = text.substring(suf + 7, mid)
        val m = text.substring(mid + 7)
        def tk(s: String) = s.split("\\s+").filter(_.nonEmpty).toSeq
        assert(tk(p) ++ tk(m) ++ tk(sfx) === toks, s"doc $id reassembly")
        assert(tk(p).length === lo && tk(m).length === (hi - lo),
          s"doc $id part lengths must equal the cuts")
      } else assert(text === toks.mkString(" "))
    }
    // the Bernoulli gate genuinely splits the fixture
    assert(out.count(_._2) > 5 && out.count(!_._2) > 5)
    // rate 0 / 1 are total
    assert(TextPipeline.fimTransform(docs, "doc_id", "text", rate = 0.0)
      .filter(col("fim_applied")).count() === 0L)
    assert(TextPipeline.fimTransform(docs, "doc_id", "text", rate = 1.0)
      .filter(!col("fim_applied")).count() === 0L)
  }

  // ---- packing with boundaries --------------------------------------------

  test("packSequencesWithBoundaries: boundaries mark exactly each doc's " +
    "first position, agree with the packed layout, and the base packer " +
    "columns are unchanged") {
    val docs = Seq((1L, "a b c d e"), (2L, "f g"), (3L, ""),
      (4L, "h i j k l m n o p q"), (5L, "r"))
      .toDF("doc_id", "text")
    val out = TextPipeline.packSequencesWithBoundaries(docs, "doc_id",
      "text", seqLen = 4)
      .as[(Long, Long, Long, String, String)].collect().sortBy(_._1)
    val base = TextPipeline.packSequences(docs, "doc_id", "text", seqLen = 4)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3, r._4)).toSeq === base.toSeq)
    // global stream: a b c d | e f g h | i j k l | m n o p | q r
    // doc starts: d1@gpos0, d2@5, d4@7, d5@16
    val got = out.map(r => r._1 -> r._5).toMap
    assert(got(0L) === "0:1")            // seq 0 holds only doc 1
    assert(got(1L) === "0:1 1:2 3:4")    // e | f g | h
    assert(got(2L) === "0:4")
    assert(got(3L) === "0:4")
    assert(got(4L) === "0:4 1:5")        // q | r
    // every boundary list is sorted by position and starts at the seq head
    out.foreach { case (sid, _, nDocs, _, b) =>
      val parts = b.split(" ").map(_.split(":")(0).toLong)
      assert(parts.toSeq === parts.sorted.toSeq, s"seq $sid boundary order")
      assert(parts.length === nDocs, s"seq $sid one boundary per doc")
      assert(parts.head === 0L, s"seq $sid first boundary at position 0")
    }
  }

  // ---- unigram-LM training ------------------------------------------------

  // Independent hard-EM replica: plain-Scala DP arrays + explicit
  // backtrack loop (the operator folds HOF expressions instead).
  private def unigramBrute(texts: Seq[String], maxLen: Int, seedMulti: Int,
                           iters: Int, scale: Long): Set[(Int, String, Long, Long)] = {
    val words = texts.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val subCnt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words; i <- 0 until w.length; l <- 1 to maxLen
         if i + l <= w.length)
      subCnt.updateWith(w.substring(i, i + l))(x => Some(x.getOrElse(0L) + c))
    val chars = subCnt.filter(_._1.length == 1).toSeq.sortBy(_._1)
    val multi = subCnt.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedMulti)
    var vocab: Seq[(String, Long)] = chars ++ multi
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long)]
    out ++= vocab.map { case (p, c) => (0, p, scale / (1L + c), c) }
    for (it <- 1 to iters) {
      val cost = vocab.map { case (p, c) => p -> scale / (1L + c) }.toMap
      val usage = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, wc) <- words) {
        val n = w.length
        val inf = Long.MaxValue / 4
        val dp = Array.fill(n + 1)(inf); dp(0) = 0L
        for (i <- 1 to n; (p, c) <- cost
             if p.length <= i && w.substring(i - p.length, i) == p)
          dp(i) = math.min(dp(i), dp(i - p.length) + c)
        var pos = n
        while (pos > 0) {
          val best = cost.keys.filter(p => p.length <= pos &&
              w.substring(pos - p.length, pos) == p &&
              dp(pos) == dp(pos - p.length) + cost(p))
            .maxBy(_.length)
          usage(best) += wc
          pos -= best.length
        }
      }
      out ++= vocab.map { case (p, _) => (it, p, cost(p), usage(p)) }
      vocab = vocab.map { case (p, _) => p -> usage(p) }
    }
    out.toSet
  }

  test("unigramTrain: full trajectory matches the array-DP replica, and " +
    "each E-step's piece usage exactly tiles the corpus characters") {
    val texts = Seq(
      "the fastest internet interna intern net nets",
      "fast faster fastest nets net the the thee",
      "internal international internet the nether net")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextPipeline.unigramTrain(docs, "text", maxPieceLen = 4,
      seedMulti = 12, iters = 2).toSet
    assert(got === unigramBrute(texts, 4, 12, 2, 1000000L))
    // coverage law: argmin segmentations concatenate back to their words,
    // so Σ cnt(p)·|p| over an E-step == Σ wcnt·|word| over the corpus
    val totalChars = texts.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .map(_.length.toLong).sum
    for (it <- 1 to 2) {
      val tiled = got.toSeq.filter(_._1 == it)
        .map { case (_, p, _, cnt) => cnt * p.length }.sum
      assert(tiled === totalChars, s"iteration $it does not tile the corpus")
    }
    // seed sanity: every corpus character survives as a piece
    val pieces0 = got.filter(_._1 == 0).map(_._2)
    texts.flatMap(_.toLowerCase.replace(" ", "")).toSet.foreach { (ch: Char) =>
      assert(pieces0.contains(ch.toString), s"char '$ch' missing from seed")
    }
  }

  // Soft-EM replica: plain-Scala forward/backward in the operator's
  // exact IEEE op order (vocab-order folds, ((α·w)·β)/Z·scale+0.5,
  // per-occurrence floor) — doubles computed in the same order are
  // bit-identical, so the comparison is exact, not approximate.
  private def unigramSoftBrute(texts: Seq[String], maxLen: Int,
                               seedMulti: Int, iters: Int,
                               scale: Long): Seq[(Int, String, Long)] = {
    val words = texts.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val subCnt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words; i <- 0 until w.length; l <- 1 to maxLen
         if i + l <= w.length)
      subCnt.updateWith(w.substring(i, i + l))(x => Some(x.getOrElse(0L) + c))
    val chars = subCnt.filter(_._1.length == 1).toSeq.sortBy(_._1)
    val multi = subCnt.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedMulti)
    var vocab: Seq[(String, Long)] = (chars ++ multi)
      .map { case (p, c) => (p, c * scale) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    out ++= vocab.map { case (p, c) => (0, p, c) }
    for (it <- 1 to iters) {
      val total = vocab.map(_._2 + scale).sum
      def wt(c: Long): Double = (c + scale).toDouble / total.toDouble
      val usage = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, wc) <- words) {
        val n = w.length
        val al = new Array[Double](n + 1); al(0) = 1.0
        for (i <- 1 to n) {
          var s = 0.0
          for ((p, c) <- vocab
               if p.length <= i && w.substring(i - p.length, i) == p)
            s += al(i - p.length) * wt(c)
          al(i) = s
        }
        val be = new Array[Double](n + 1); be(0) = 1.0 // be(j) = β(n-j)
        for (j <- 1 to n) {
          var s = 0.0
          for ((p, c) <- vocab
               if p.length <= j && w.substring(n - j, n - j + p.length) == p)
            s += be(j - p.length) * wt(c)
          be(j) = s
        }
        for (i <- 1 to n; (p, c) <- vocab
             if p.length <= i && w.substring(i - p.length, i) == p) {
          val f = math.floor(
            al(i - p.length) * wt(c) * be(n - i) / al(n) * scale.toDouble
              + 0.5).toLong
          usage(p) += wc * f
        }
      }
      vocab = vocab.map { case (p, _) => (p, usage(p)) }
      out ++= vocab.map { case (p, e) => (it, p, e) }
    }
    out.toSeq
  }

  test("unigramTrainSoft: full trajectory is BIT-identical to the " +
    "plain-Scala forward-backward replica (fixed IEEE op order)") {
    val texts = Seq(
      "the fastest internet interna intern net nets",
      "fast faster fastest nets net the the thee",
      "internal international internet the nether net")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextPipeline.unigramTrainSoft(docs, "text", maxPieceLen = 4,
      seedMulti = 12, iters = 2)
    assert(got.toSet === unigramSoftBrute(texts, 4, 12, 2, 1000000L).toSet)
  }

  test("unigramTrainSoft: posterior mass per word sums to ~its piece " +
    "count (soft counts tile the corpus in expectation) and hard-EM " +
    "winners keep the dominant share") {
    val texts = Seq(
      "abab abab abab cd cd",
      "ab ab cd abcd abcd")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val scale = 1000000L
    val got = TextPipeline.unigramTrainSoft(docs, "text", maxPieceLen = 4,
      seedMulti = 8, iters = 2, scale = scale)
    // expected counts weighted by piece length tile the corpus chars
    // (up to the per-occurrence fixed-point rounding): Σ e(p)·|p| ≈
    // scale · total corpus chars
    val totalChars = texts.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .map(_.length.toLong).sum
    for (it <- 1 to 2) {
      val tiled = got.filter(_._1 == it).map { case (_, p, e) => e * p.length }.sum
      val target = totalChars * scale
      assert(math.abs(tiled - target) <= totalChars * 100,
        s"iter $it soft counts do not tile: $tiled vs $target")
    }
    // soft EM spreads mass over alternatives but the frequent piece
    // "ab" must still dominate its single-char decomposition's share
    val e = got.filter(_._1 == 2).map { case (_, p, c) => p -> c }.toMap
    assert(e("ab") > 0L && e("ab") > e.getOrElse("b", 0L) / 4)
  }

  // Subword-regularization sampler replica: plain-Scala FFBS in the
  // operator's exact op order — forward α in vocab-fold order, per-step
  // unitHash draw keyed (doc:widx:pos), cumulative-mass choice with the
  // identical ((α·w) sums, u·α threshold) arithmetic.
  private def sampleBrute(docs: Seq[(Long, String)],
                          vocab: Seq[(String, Long)], scale: Long,
                          salt: String): Map[Long, (Long, Long, String)] = {
    val total = vocab.map(_._2 + scale).sum
    def wt(c: Long): Double = (c + scale).toDouble / total.toDouble
    def unit(key: String): Double =
      (graft.functions.Hashes.fnv1a64(key) >>> 11).toDouble / 9007199254740992.0
    docs.map { case (doc, text) =>
      val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val segs = words.zipWithIndex.map { case (word, wi) =>
        val widx = wi + 1L
        val n = word.length
        val al = new Array[Double](n + 1); al(0) = 1.0
        for (i <- 1 to n) {
          var s = 0.0
          for ((p, c) <- vocab
               if p.length <= i && word.substring(i - p.length, i) == p)
            s += al(i - p.length) * wt(c)
          al(i) = s
        }
        var pos = n
        val ps = scala.collection.mutable.ArrayBuffer.empty[String]
        var steps = 0
        while (pos > 0 && steps < n) {
          steps += 1
          val t = unit(s"$doc:$widx:$pos:$salt") * al(pos)
          var cum = 0.0; var bl = 0
          for ((p, c) <- vocab
               if p.length <= pos && word.substring(pos - p.length, pos) == p) {
            val m = al(pos - p.length) * wt(c)
            if (bl == 0 && cum + m > t) bl = p.length
            cum += m
          }
          ps += word.substring(pos - bl, pos)
          pos -= bl
        }
        ps.reverse.mkString("\u001f")
      }
      val nPieces = segs.map(_.count(_ == '\u001f') + 1L).sum
      doc -> ((words.length.toLong, nPieces, segs.mkString(" ")))
    }.toMap
  }

  test("unigramSampleEncode: sampled segmentations are BIT-identical to " +
    "the plain-Scala FFBS replica, and every word's pieces tile it") {
    val docs = Seq(
      (1L, "abab baba abba ab ba"),
      (2L, "aa bb abab abab"),
      (3L, "b a ba ab"))
    val vocab = Seq( // canonical order: chars sorted, then multis
      ("a", 5000000L), ("b", 3000000L),
      ("ab", 2000000L), ("ba", 1500000L), ("abab", 800000L))
    val got = TextPipeline.unigramSampleEncode(
        docs.toDF("doc_id", "text"), "doc_id", "text", vocab)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === sampleBrute(docs, vocab, 1000000L, "sseg"))
    // tiling: removing separators reproduces the lowercased words
    for ((doc, (_, _, seg)) <- got) {
      val orig = docs.find(_._1 == doc).get._2.toLowerCase
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(seg.replace("\u001f", "") === orig, s"doc $doc pieces do not tile")
    }
  }

  test("unigramSampleEncode: different salts draw different segmentations " +
    "somewhere (regularization is live), same salt replays identically") {
    val texts = (0 until 30).map(i => i.toLong -> "abab abab baba abba")
    val vocab = Seq(("a", 4000000L), ("b", 4000000L),
      ("ab", 3000000L), ("ba", 2000000L))
    val df = texts.toDF("doc_id", "text")
    def run(salt: String) = TextPipeline.unigramSampleEncode(
        df, "doc_id", "text", vocab, salt = salt)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r._4).toMap
    val a = run("sseg"); val b = run("sseg"); val c = run("other")
    assert(a === b, "same salt must replay byte-identically")
    assert(a !== c, "a different salt must perturb at least one draw")
    // and the sampler actually uses more than one segmentation of the
    // SAME word across occurrences/docs (the whole point of Kudo §3)
    val abSegs = a.values.flatMap(_.split(" ")).toSet
    assert(abSegs.size > 1, s"degenerate sampling: $abSegs")
  }

  // n-best replica: per position keep the n cheapest (cost, '/'-joined
  // seg) pairs sorted by (cost, seg), extend by every matching piece.
  private def nbestBrute(words: Set[String], vocab: Seq[(String, Long)],
                         n: Int): Set[(String, Long, Long, String)] =
    words.flatMap { w =>
      val len = w.length
      val best = Array.fill(len + 1)(Seq.empty[(Long, String)])
      best(0) = Seq((0L, ""))
      for (i <- 1 to len) {
        val cands = for {
          (p, c) <- vocab
          if p.length <= i && w.substring(i - p.length, i) == p
          (bc, bs) <- best(i - p.length)
        } yield (bc + c, if (bs.isEmpty) p else s"$bs/$p")
        best(i) = cands.sortBy(identity).take(n)
      }
      best(len).zipWithIndex.map { case ((c, s), k) => (w, k + 1L, c, s) }
    }

  test("nbestSegment: matches the plain n-best DP replica; rank 1 is the " +
    "min-cost segmentation; ranks are cost-ordered, distinct, and tile") {
    val texts = Seq("abab abba ba ab a", "abab bab aab abab")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val vocab = Seq(("a", 400000L), ("b", 500000L),
      ("ab", 600000L), ("ba", 700000L), ("abab", 900000L))
    val n = 3
    val got = TextPipeline.nbestSegment(docs, "text", vocab, n)
      .as[(String, Long, Long, String)].collect().toSet
    val words = texts.flatMap(_.split("\\s+").filter(_.nonEmpty)).toSet
    assert(got === nbestBrute(words, vocab, n))
    // properties: per word, ranks ordered by (cost, seg), segs distinct,
    // each tiles its word, and rank count <= n
    for ((w, rows) <- got.groupBy(_._1)) {
      val ordered = rows.toSeq.sortBy(_._2)
      assert(ordered.map(r => (r._3, r._4)) ===
        ordered.map(r => (r._3, r._4)).sorted, s"word $w not cost-ordered")
      assert(ordered.map(_._4).distinct.size === ordered.size)
      assert(ordered.size <= n)
      ordered.foreach(r => assert(r._4.replace("/", "") === w))
    }
  }

  // Full-trainer replica: the soft E-step (unigramSoftBrute's arithmetic
  // verbatim) plus the prune schedule — costs from previous counts,
  // alt-cost DP minus self, loss (e DIV scale)·(alt − cost), smallest-N
  // multi-char prune.
  private def unigramSoftPrunedBrute(texts: Seq[String], maxLen: Int,
                                     seedMulti: Int, rounds: Int,
                                     pruneCount: Int, scale: Long)
      : Set[(Int, String, Long, Long, Long, Boolean)] = {
    val words = texts.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val subCnt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words; i <- 0 until w.length; l <- 1 to maxLen
         if i + l <= w.length)
      subCnt.updateWith(w.substring(i, i + l))(x => Some(x.getOrElse(0L) + c))
    val chars = subCnt.filter(_._1.length == 1).toSeq.sortBy(_._1)
    val multi = subCnt.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedMulti)
    var vocab: Seq[(String, Long)] = (chars ++ multi)
      .map { case (p, c) => (p, c * scale) }
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Int, String, Long, Long, Long, Boolean)]
    for (r <- 1 to rounds) {
      val costMap = vocab.map { case (p, c) =>
        p -> (scale * scale) / (scale + c) }.toMap
      // soft E-step, identical arithmetic to unigramSoftBrute
      val total = vocab.map(_._2 + scale).sum
      def wt(c: Long): Double = (c + scale).toDouble / total.toDouble
      val usage = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, wc) <- words) {
        val n = w.length
        val al = new Array[Double](n + 1); al(0) = 1.0
        for (i <- 1 to n) {
          var s = 0.0
          for ((p, c) <- vocab
               if p.length <= i && w.substring(i - p.length, i) == p)
            s += al(i - p.length) * wt(c)
          al(i) = s
        }
        val be = new Array[Double](n + 1); be(0) = 1.0
        for (j <- 1 to n) {
          var s = 0.0
          for ((p, c) <- vocab
               if p.length <= j && w.substring(n - j, n - j + p.length) == p)
            s += be(j - p.length) * wt(c)
          be(j) = s
        }
        for (i <- 1 to n; (p, c) <- vocab
             if p.length <= i && w.substring(i - p.length, i) == p) {
          val f = math.floor(
            al(i - p.length) * wt(c) * be(n - i) / al(n) * scale.toDouble
              + 0.5).toLong
          usage(p) += wc * f
        }
      }
      def altCost(p: String): Long = {
        val n = p.length
        val dp = Array.fill(n + 1)(Long.MaxValue / 4); dp(0) = 0L
        for (i <- 1 to n; (q, qc) <- costMap
             if q != p && q.length <= i && p.substring(i - q.length, i) == q)
          dp(i) = math.min(dp(i), dp(i - q.length) + qc)
        dp(n)
      }
      val scored = vocab.map { case (p, _) =>
        val e = usage(p)
        val loss = if (p.length == 1) -1L
                   else (e / scale) * (altCost(p) - costMap(p))
        (p, e, costMap(p), loss)
      }
      val pruned = scored.filter(_._1.length >= 2)
        .sortBy { case (p, _, _, l) => (l, p) }
        .take(pruneCount).map(_._1).toSet
      out ++= scored.map { case (p, e, c, l) => (r, p, c, e, l, pruned(p)) }
      vocab = scored.filterNot(t => pruned(t._1)).map(t => (t._1, t._2))
    }
    out.toSet
  }

  test("unigramTrainSoftPruned: the complete Kudo trainer (soft E-step + " +
    "prune schedule) matches the plain-Scala replica bit-for-bit, the " +
    "vocabulary shrinks by pruneCount per round, and chars never prune") {
    val texts = Seq(
      "the fastest internet interna intern net nets",
      "fast faster fastest nets net the the thee",
      "internal international internet the nether net")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextPipeline.unigramTrainSoftPruned(docs, "text",
      maxPieceLen = 4, seedMulti = 12, rounds = 2, pruneCount = 4)
    assert(got.toSet === unigramSoftPrunedBrute(texts, 4, 12, 2, 4, 1000000L))
    // schedule invariants
    val byRound = got.groupBy(_._1)
    assert(byRound(1).count(_._6) === 4 && byRound(2).count(_._6) === 4)
    assert(byRound(2).size === byRound(1).size - 4,
      "round 2 vocabulary must be round 1 minus the pruned pieces")
    assert(got.filter(_._2.length == 1).forall(r => !r._6 && r._5 == -1L),
      "single chars are the segmentability floor")
  }

  // Pruned variant of the replica: E-step as above, then first-order
  // loss cnt·(altCost − cost) and the smallest-loss prune.
  private def unigramPrunedBrute(texts: Seq[String], maxLen: Int,
                                 seedMulti: Int, rounds: Int, pruneCount: Int,
                                 scale: Long): Set[(Int, String, Long, Long, Long, Boolean)] = {
    val words = texts.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val subCnt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words; i <- 0 until w.length; l <- 1 to maxLen
         if i + l <= w.length)
      subCnt.updateWith(w.substring(i, i + l))(x => Some(x.getOrElse(0L) + c))
    val chars = subCnt.filter(_._1.length == 1).toSeq.sortBy(_._1)
    val multi = subCnt.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedMulti)
    var vocab: Seq[(String, Long)] = chars ++ multi
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Int, String, Long, Long, Long, Boolean)]
    for (r <- 1 to rounds) {
      val cost = vocab.map { case (p, c) => p -> scale / (1L + c) }.toMap
      val usage = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, wc) <- words) {
        val n = w.length
        val inf = Long.MaxValue / 4
        val dp = Array.fill(n + 1)(inf); dp(0) = 0L
        for (i <- 1 to n; (p, c) <- cost
             if p.length <= i && w.substring(i - p.length, i) == p)
          dp(i) = math.min(dp(i), dp(i - p.length) + c)
        var pos = n
        while (pos > 0) {
          val best = cost.keys.filter(p => p.length <= pos &&
              w.substring(pos - p.length, pos) == p &&
              dp(pos) == dp(pos - p.length) + cost(p))
            .maxBy(_.length)
          usage(best) += wc
          pos -= best.length
        }
      }
      def alt(p: String): Long = {
        val n = p.length
        val dp = Array.fill(n + 1)(Long.MaxValue / 4); dp(0) = 0L
        for (i <- 1 to n; (q, qc) <- cost
             if q != p && q.length <= i && p.substring(i - q.length, i) == q)
          dp(i) = math.min(dp(i), dp(i - q.length) + qc)
        dp(n)
      }
      val scored = vocab.map { case (p, _) =>
        val loss = if (p.length == 1) -1L else usage(p) * (alt(p) - cost(p))
        (p, usage(p), cost(p), loss)
      }
      val pruned = scored.filter(_._4 >= 0)
        .sortBy { case (p, _, _, l) => (l, p) }.take(pruneCount).map(_._1).toSet
      out ++= scored.map { case (p, c, co, l) => (r, p, co, c, l, pruned(p)) }
      vocab = scored.filterNot(t => pruned(t._1)).map(t => (t._1, t._2))
    }
    out.toSet
  }

  test("unigramTrainPruned: trajectory matches the replica; losses are " +
    "non-negative for used pieces; exactly pruneCount multi-char pieces " +
    "drop per round and chars never do") {
    val texts = Seq(
      "the fastest internet interna intern net nets",
      "fast faster fastest nets net the the thee",
      "internal international internet the nether net")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextPipeline.unigramTrainPruned(docs, "text", maxPieceLen = 4,
      seedMulti = 12, rounds = 2, pruneCount = 4)
    assert(got.toSet === unigramPrunedBrute(texts, 4, 12, 2, 4, 1000000L))
    for (r <- 1 to 2) {
      val round = got.filter(_._1 == r)
      assert(round.count(_._6) === 4, s"round $r must prune exactly 4")
      assert(round.filter(_._6).forall(_._2.length >= 2),
        s"round $r pruned a single char")
      assert(round.filter(t => t._2.length >= 2 && t._4 > 0).forall(_._5 >= 0),
        s"round $r used piece with negative loss")
    }
    // round 2's alive set = round 1's survivors
    val alive2 = got.filter(_._1 == 2).map(_._2).toSet
    val survivors1 = got.filter(t => t._1 == 1 && !t._6).map(_._2).toSet
    assert(alive2 === survivors1)
    // force the positive-loss competition: prune more than the unused
    // pool, so USED pieces must be ranked by their genuine losses
    val unused1 = got.count(t => t._1 == 1 && t._2.length >= 2 && t._4 == 0L)
    val pc = unused1 + 2
    val got2 = TextPipeline.unigramTrainPruned(docs, "text", maxPieceLen = 4,
      seedMulti = 12, rounds = 1, pruneCount = pc)
    assert(got2.toSet === unigramPrunedBrute(texts, 4, 12, 1, pc, 1000000L))
    val posPruned = got2.filter(t => t._6 && t._5 > 0L)
    assert(posPruned.size === 2, "exactly the 2 smallest positive losses prune")
    val keptPosLosses = got2.filter(t => !t._6 && t._5 > 0L).map(_._5)
    assert(keptPosLosses.forall(l => posPruned.forall(_._5 <= l)),
      "every surviving positive loss is >= every pruned one")
  }

  test("unigramTrain fuzz: matches the replica on random corpora across " +
    "parameter settings") {
    val rnd = new scala.util.Random(8128)
    for (round <- 0 until 3) {
      val (mpl, sm, iters) = Seq((3, 8, 1), (4, 16, 2), (2, 6, 3))(round)
      def w() = (0 until 2 + rnd.nextInt(5))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val texts = (0 until 10).map(_ => (0 until 4 + rnd.nextInt(5)).map(_ => w()).mkString(" "))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextPipeline.unigramTrain(docs, "text", mpl, sm, iters).toSet
      assert(got === unigramBrute(texts, mpl, sm, iters, 1000000L),
        s"round $round (maxLen=$mpl seedMulti=$sm iters=$iters)")
    }
  }

  // ---- T5 span corruption -------------------------------------------------

  test("spanCorrupt: differential vs a brute-force rule replica; " +
    "interleaving input and target restores the original tokens") {
    val docs = (1L to 50L).map(i =>
      (i, (1 to (i % 23).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextPipeline.spanCorrupt(docs, "doc_id", "text", 4, 4)
      .as[(Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    def maskedRef(id: Long, b: Int): Boolean = {
      val h = graft.functions.Hashes.fnv1a64(s"$id:span$b")
      ((h % 4) + 4) % 4 == 0
    }
    (1L to 50L).foreach { id =>
      val toks = (1 to (id % 23).toInt).map(j => s"w$j")
      val nb = (toks.length + 3) / 4
      val blocks = (0 until nb).map(b => (b, toks.slice(b * 4, b * 4 + 4),
        maskedRef(id, b)))
      val ranks = blocks.scanLeft(0) { case (a, (_, _, m)) =>
        if (m) a + 1 else a }
      val input = blocks.map { case (b, bt, m) =>
        if (m) s"<extra_id_${ranks(b)}>" else bt.mkString(" ") }.mkString(" ")
      val masked = blocks.filter(_._3)
      val target = if (masked.isEmpty) "<extra_id_0>"
        else masked.map { case (b, bt, _) =>
          s"<extra_id_${ranks(b)}> ${bt.mkString(" ")}" }.mkString(" ") +
          s" <extra_id_${masked.length}>"
      val (_, n, nm, gi, gt) = got(id)
      assert(n === toks.length.toLong && nm === masked.length.toLong, s"doc $id")
      assert(gi === input, s"doc $id input")
      assert(gt === target, s"doc $id target")
      // reconstruction: substitute each target span back into the input
      var restored = gi
      masked.zipWithIndex.foreach { case ((_, bt, _), k) =>
        restored = restored.replace(s"<extra_id_$k>", bt.mkString(" ")) }
      assert(restored.split("\\s+").filter(_.nonEmpty).toSeq === toks,
        s"doc $id reconstruction")
    }
    // empty doc: empty input, bare closing sentinel
    assert(got(46L)._4 === "" && got(46L)._5 === "<extra_id_0>") // 46%23=0
  }

  // ---- length-bucketed batching -------------------------------------------

  test("lengthBucketBatches: buckets are n DIV width, batches stay inside " +
    "one bucket, are full except the per-bucket tail, and are " +
    "layout-independent") {
    val docs = (1L to 120L).map(i =>
      (i, (1 to (i % 37).toInt).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextPipeline.lengthBucketBatches(docs, "doc_id", "text",
      bucketWidth = 8, batchSize = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === 120)
    out.foreach { case (id, n, bucket, _, pos) =>
      assert(bucket === n / 8, s"doc $id bucket")
      assert(pos >= 0 && pos < 4, s"doc $id pos_in_batch")
    }
    // a batch never spans buckets; only the last batch of a bucket is short
    out.groupBy(r => (r._3, r._4)).foreach { case ((bucket, batch), rows) =>
      assert(rows.length <= 4)
      assert(rows.map(_._5).sorted.toSeq === (0L until rows.length).toSeq,
        s"bucket $bucket batch $batch positions must be contiguous from 0")
    }
    out.groupBy(_._3).foreach { case (bucket, rows) =>
      val nBatches = rows.map(_._4).distinct.length
      val short = rows.groupBy(_._4).count(_._2.length < 4)
      assert(short <= 1, s"bucket $bucket must have at most one short batch")
      assert(nBatches === (rows.length + 3) / 4, s"bucket $bucket batch count")
    }
    val again = TextPipeline.lengthBucketBatches(docs.repartition(7),
      "doc_id", "text", bucketWidth = 8, batchSize = 4)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(again === out.sortBy(_._1).toSeq)
  }

  // ---- soft-EM / FFBS indexed-kernel hybrid -------------------------------

  private def wordsFrameOf(docs: org.apache.spark.sql.DataFrame) = docs
    .select(explode(graft.functions.TextFunctions.tokens(lower($"text"))).as("word"))
    .groupBy("word").agg(count(lit(1)).cast("long").as("wcnt"))

  test("softEmCounts: the hash-indexed kernel is BIT-identical to the " +
    "vocab-literal fold, at gate vocab and at a several-hundred-piece vocab") {
    val texts = Seq(
      "the fastest internet interna intern net nets",
      "fast faster fastest nets net the the thee",
      "internal international internet the nether net")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val seed = TextPipeline.unigramTrainSoft(docs, "text", maxPieceLen = 4,
      seedMulti = 12, iters = 1).filter(_._1 == 0).map(t => (t._2, t._3))
    val words = wordsFrameOf(docs)
    assert(TextPipeline.softEmCounts(words, seed, 1000000L, Some(false)) ===
      TextPipeline.softEmCounts(words, seed, 1000000L, Some(true)))
    // larger vocab (past the crossover): pseudo-words give hundreds of
    // distinct multi-char substrings, exercising rank-order restoration
    val big = (0 until 60).map { i =>
      val w = java.lang.Long.toString(i * 2654435761L & 0xfffffL, 26)
        .map(c => if (c.isDigit) ('a' + (c - '0')).toChar else c)
      (i.toLong, s"$w ${w.reverse} ${w.take(3)}")
    }.toDF("doc_id", "text")
    val seedBig = TextPipeline.unigramTrainSoft(big, "text", maxPieceLen = 5,
      seedMulti = 400, iters = 1).filter(_._1 == 0).map(t => (t._2, t._3))
    assert(seedBig.size > 300, s"fixture too small: ${seedBig.size} pieces")
    val wordsBig = wordsFrameOf(big)
    assert(TextPipeline.softEmCounts(wordsBig, seedBig, 1000000L, Some(false)) ===
      TextPipeline.softEmCounts(wordsBig, seedBig, 1000000L, Some(true)))
  }

  test("unigramSampleEncode: the indexed α + walk kernel replays the " +
    "literal fold's draws BIT-identically") {
    val docs = Seq(
      (1L, "abab baba abba ab ba"),
      (2L, "aa bb abab abab"),
      (3L, "b a ba ab"))
    val vocab = Seq(
      ("a", 5000000L), ("b", 3000000L),
      ("ab", 2000000L), ("ba", 1500000L), ("abab", 800000L))
    def run(forced: Boolean) = TextPipeline.unigramSampleEncode(
        docs.toDF("doc_id", "text"), "doc_id", "text", vocab,
        forceIndexed = Some(forced))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(run(false) === run(true))
    // and on a fixture whose vocab is trained (chars + many multis, the
    // canonical-order regime) with a non-default salt
    val texts = (0 until 40).map { i =>
      val w = java.lang.Long.toString(i * 40503L + 7, 26)
        .map(c => if (c.isDigit) ('a' + (c - '0')).toChar else c)
      (i.toLong, s"$w $w${w.take(2)} ${w.reverse}")
    }
    val tdocs = texts.toDF("doc_id", "text")
    val trained = TextPipeline.unigramTrainSoft(tdocs, "text",
      maxPieceLen = 4, seedMulti = 150, iters = 1)
      .filter(_._1 == 1).map(t => (t._2, t._3))
    def runT(forced: Boolean) = TextPipeline.unigramSampleEncode(
        tdocs, "doc_id", "text", trained, salt = "alt",
        forceIndexed = Some(forced))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(runT(false) === runT(true))
  }

  // the round-15 kernel extension: hard-EM Viterbi, n-best, and the
  // prune-score inversion — each pinned against its literal/quadratic
  // reference on the same two fixture regimes as the soft specs

  private def bigPseudoDocs = (0 until 60).map { i =>
    val w = java.lang.Long.toString(i * 2654435761L & 0xfffffL, 26)
      .map(c => if (c.isDigit) ('a' + (c - '0')).toChar else c)
    (i.toLong, s"$w ${w.reverse} ${w.take(3)}")
  }.toDF("doc_id", "text")

  test("unigramTrain: the hash-indexed Viterbi kernel is BIT-identical to " +
    "the vocab-literal DP + backtrack, at gate and several-hundred-piece vocabs") {
    val docs = Seq(
      (1L, "the fastest internet interna intern net nets"),
      (2L, "fast faster fastest nets net the the thee"),
      (3L, "internal international internet the nether net"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame, sm: Int, forced: Boolean) =
      TextPipeline.unigramTrain(d, "text", maxPieceLen = 4, seedMulti = sm,
        iters = 2, forceIndexed = Some(forced))
    assert(run(docs, 12, forced = false) === run(docs, 12, forced = true))
    val big = bigPseudoDocs
    val a = run(big, 400, forced = false)
    assert(a.count(_._1 == 0) > 300, s"fixture too small: ${a.count(_._1 == 0)}")
    assert(a === run(big, 400, forced = true))
  }

  test("nbestSegment: the indexed kernel's sorted candidate slices are " +
    "BIT-identical to the literal fold's, both fixtures") {
    val docs = Seq((1L, "abab baba abba ab ba"), (2L, "aa bb abab abab"))
      .toDF("doc_id", "text")
    val vocab = Seq(("a", 900L), ("b", 1100L), ("ab", 700L), ("ba", 800L),
      ("abab", 650L), ("bb", 1300L))
    def run(d: org.apache.spark.sql.DataFrame, v: Seq[(String, Long)],
            forced: Boolean) =
      TextPipeline.nbestSegment(d, "text", v, n = 3,
          forceIndexed = Some(forced))
        .as[(String, Long, Long, String)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    assert(run(docs, vocab, forced = false) === run(docs, vocab, forced = true))
    val big = bigPseudoDocs
    val trained = TextPipeline.unigramTrain(big, "text", maxPieceLen = 5,
      seedMulti = 400, iters = 1).filter(_._1 == 1)
      .map { case (_, p, _, cnt) => (p, 1000000L / (1L + cnt)) }
    assert(run(big, trained, forced = false) === run(big, trained, forced = true))
  }

  test("duplicate-bearing vocab: the Viterbi kernel is ENTRY-faithful to " +
    "the literal folds — nbestSegment (per-entry candidates) and emCounts " +
    "(min over every entry) no longer throw, and match bit-for-bit") {
    val docs = Seq((1L, "abab ba aab bab ab"), (2L, "bb aa abab ba"))
      .toDF("doc_id", "text")
    // 'ab' duplicated at DIFFERENT costs (each entry contributes its own
    // n-best candidate — a per-key min would drop one); 'ba' duplicated
    // at the SAME cost (two identical candidates can occupy two slots)
    val vocab = Seq(("a", 500L), ("b", 600L), ("ab", 900L), ("ab", 700L),
      ("ba", 400L), ("ba", 400L), ("bb", 800L), ("aa", 800L))
    def nb(forced: Boolean) =
      TextPipeline.nbestSegment(docs, "text", vocab, n = 4,
          forceIndexed = Some(forced))
        .as[(String, Long, Long, String)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    val litRows = nb(forced = false)
    assert(nb(forced = true) === litRows)
    // the duplicate entries really do multiply candidates: 'ab' appears
    // as its own 1-piece segmentation at BOTH costs
    val abRows = litRows.filter(r => r._1 == "ab" && r._4 == "ab").map(_._3)
    assert(abRows.sorted === Seq(700L, 900L), s"got $abRows")
    def em(forced: Boolean) =
      TextPipeline.emCounts(
        docs.select(explode(graft.functions.TextFunctions.tokens(
            lower(col("text")))).as("word"))
          .groupBy("word").agg(count(lit(1)).cast("long").as("wcnt")),
        vocab, scale = 1000000L, forceIndexed = Some(forced))
    assert(em(forced = true) === em(forced = false))
  }

  test("unigramTrainPruned + unigramTrainSoftPruned: full trajectories " +
    "identical on the literal and indexed E-step paths") {
    val big = bigPseudoDocs
    def hard(forced: Boolean) = TextPipeline.unigramTrainPruned(big, "text",
      maxPieceLen = 4, seedMulti = 150, rounds = 2, pruneCount = 8,
      forceIndexed = Some(forced))
    assert(hard(forced = false) === hard(forced = true))
    def soft(forced: Boolean) = TextPipeline.unigramTrainSoftPruned(big,
      "text", maxPieceLen = 4, seedMulti = 150, rounds = 2, pruneCount = 8,
      forceIndexed = Some(forced))
    assert(soft(forced = false) === soft(forced = true))
  }

  test("cdcChunks: chunks tile the raw text, boundaries are shift-robust " +
    "(an inserted prefix leaves all later chunk texts identical), short " +
    "and empty docs behave, layout-independent") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefgh "
    val body = (0 until 800).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val docs = Seq(
      (1L, body),
      (2L, "PREFIX-" + body), // shifted copy: CDC must re-sync
      (3L, "short"),          // shorter than the window: one chunk
      (4L, "x" * 16)          // exactly window-sized
    ).toDF("doc_id", "text")
    val out = TextPipeline.cdcChunks(docs, "doc_id", "text",
        window = 16, divisor = 32L, remainder = 0L)
      .as[(Long, Long, Long, String)].collect()
    // tiling: concat in idx order restores every doc byte-exactly
    for ((id, text) <- Seq(1L -> body, 2L -> ("PREFIX-" + body),
        3L -> "short", 4L -> "x" * 16)) {
      val tiles = out.filter(_._1 == id).sortBy(_._2)
      assert(tiles.map(_._4).mkString === text, s"doc $id must tile")
      assert(tiles.head._3 === 1L && tiles.map(_._2).toSeq === tiles.indices.map(_.toLong))
    }
    // shift-robustness: every chunk after doc 1's FIRST boundary appears
    // verbatim as doc 2's suffix (doc 2 may gain extra boundaries only in
    // the windows spanning the prefix joint, all BEFORE the first
    // translated boundary — so the suffixes align exactly)
    val c1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._4)
    val c2 = out.filter(_._1 == 2L).sortBy(_._2).map(_._4)
    assert(c1.length > 5, s"fixture too smooth: ${c1.length} chunks")
    assert(c2.takeRight(c1.length - 1).toSeq === c1.drop(1).toSeq,
      "all chunks after the re-sync boundary must be identical")
    val again = TextPipeline.cdcChunks(docs.repartition(5), "doc_id", "text",
        window = 16, divisor = 32L, remainder = 0L)
      .as[(Long, Long, Long, String)].collect()
    assert(again.sortBy(r => (r._1, r._2)).toSeq ===
      out.sortBy(r => (r._1, r._2)).toSeq)
    // the codegen'd CdcCutsExpr (default) is BIT-identical to the SQL
    // HOF reference path — same fnv over the same zero-copy windows
    val sqlPath = TextPipeline.cdcChunks(docs, "doc_id", "text",
        window = 16, divisor = 32L, remainder = 0L,
        forceNative = Some(false))
      .as[(Long, Long, Long, String)].collect()
    assert(sqlPath.sortBy(r => (r._1, r._2)).toSeq ===
      out.sortBy(r => (r._1, r._2)).toSeq)
    assert(TextPipeline.cdcChunks(Seq((9L, "")).toDF("doc_id", "text"),
      "doc_id", "text", 16, 32L, 0L).count() === 0L)
  }

  test("dedupCdcKeepFirst: a duplicated passage at an ARBITRARY offset " +
    "dedups away (aligned chunking provably misses it)") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefgh "
    val body = (0 until 600).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    // the prefix carries 3 whitespace tokens, so doc 2's TOKEN stream
    // shifts by 3 (≠ 0 mod 8) — every 8-token aligned chunk differs
    val docs = Seq(
      (1L, body),
      (2L, "zzz unaligned prefix " + body), // same passage, shifted
      (3L, "an unrelated document body")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupCdcKeepFirst(docs, "doc_id", "text",
        window = 16, divisor = 32L, remainder = 0L)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 is first everywhere: fully kept, reassembles byte-exactly
    assert(out(1L)._3 === out(1L)._2 && out(1L)._4 === body)
    // doc 2 keeps its fresh prefix chunk(s) but loses the shifted copy
    assert(out(2L)._3 < out(2L)._2,
      s"shifted duplicate must lose chunks: ${out(2L)}")
    assert(out(2L)._4.length < ("zzz unaligned prefix " + body).length)
    // ALIGNED chunking on the same corpus keeps doc 2 intact — the
    // contrast that motivates CDC (tokens differ by the prefix shift)
    val aligned = Dedup.dedupChunksKeepFirst(docs, "doc_id", "text",
        chunkTokens = 8)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(aligned(2L)._3 === aligned(2L)._2,
      "aligned chunking should MISS the shifted duplicate (whole words " +
        "re-chunk identically only when token-aligned)")
    assert(out(3L)._3 === out(3L)._2)
  }

  test("bpeEncodeDropout: p=0 degenerates to bpeEncode, p=1000 emits raw " +
    "symbols, every word's pieces tile it, and reruns replay identically") {
    val docs = Seq(
      (1L, "the thesis lathe the"),
      (2L, "theme the hat teeth"),
      (3L, "the the the breathe")).toDF("doc_id", "text")
    val merges = Seq(("t", "h"), ("th", "e"), ("e", "</w>"))
    def run(p: Long, salt: String = "bpedrop") =
      TextPipeline.bpeEncodeDropout(docs, "doc_id", "text", merges, p, salt)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    // p=0: counts equal plain bpeEncode's
    val p0 = run(0L)
    val plain = TextPipeline.bpeEncode(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(p0.map(t => (t._1, t._2, t._3)) === plain)
    // p=1000: every merge drops — tokens per word = chars + 1 (</w>)
    val p1000 = run(1000L)
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val row = p1000.find(_._1 == id).get
      assert(row._3 === ws.map(_.length + 1L).sum, s"doc $id raw symbols")
    }
    // p=0.3: tiling law — stripping separators and </w> restores the text
    val p300 = run(300L)
    p300.foreach { case (id, _, _, enc) =>
      val orig = docs.as[(Long, String)].collect().find(_._1 == id).get._2
        .toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(enc.replace("\u001f", "").replace("</w>", "") === orig,
        s"doc $id pieces do not tile")
    }
    // regularization is live: the word 'the' segments differently across
    // occurrences somewhere in the fixture, yet reruns replay identically
    assert(p300 === run(300L), "same salt must replay byte-identically")
    assert(p300 !== run(300L, salt = "other"),
      "a different salt must perturb at least one draw")
    val theSegs = p300.flatMap(_._4.split(" "))
      .filter(_.replace("\u001f", "").replace("</w>", "") == "the").toSet
    assert(theSegs.size > 1, s"degenerate dropout: $theSegs")
    // layout-independent
    val again = TextPipeline.bpeEncodeDropout(docs.repartition(7), "doc_id",
        "text", merges, 300L)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(again === p300)
  }

  test("bpeEncodeDropout: kernel, batched-fold, and per-merge-fold paths " +
    "are BIT-identical — ':'-bearing string doc ids included") {
    // string doc ids WITH ':' — the aliasing class the length-prefixed
    // draw key kills; any key-rendering mismatch between the three paths
    // (or a missed prefix in one of them) diverges on this fixture.
    // 'thecab'/'thedog' make members 2+ of a batch fire AFTER member 1
    // fused in the SAME word, exercising the fold-step re-derivation
    // (j − accepted lower-member fuses) on both its branches: when the
    // (th,e) draw accepts, (c,a)'s sequential step shifts by one; when
    // it drops, it must not.
    val docs = Seq(
      ("d:1", "thecab thedog the cab dog fed hat the"),
      ("d", "1:the cab fed cab thecab dog dog"),
      ("x", "abba cab the fed thedog dog hat")).toDF("doc_id", "text")
    // groups: [(t,h)], [(th,e),(c,a),(d,o)], [(f,e),(ca,b)], [(e,d),(h,a)]
    val merges = Seq(("t", "h"), ("th", "e"), ("c", "a"), ("d", "o"),
      ("f", "e"), ("ca", "b"), ("e", "d"), ("h", "a"))
    assert(TextPipeline.batchMerges(merges).exists(_.size > 1),
      "fixture must exercise a multi-member batch")
    for (p <- Seq(0L, 300L, 700L)) {
      def run(fl: Option[Boolean], lb: Boolean) =
        TextPipeline.bpeEncodeDropout(docs, "doc_id", "text", merges, p,
            forceLiteral = fl, literalBatched = lb)
          .as[(String, Long, Long, String)].collect().sortBy(_._1).toSeq
      val kernel = run(None, lb = true)
      assert(kernel === run(Some(true), lb = true), s"kernel vs batched, p=$p")
      assert(kernel === run(Some(true), lb = false), s"kernel vs per-merge, p=$p")
    }
  }

  test("bpeEncode/bpeEncodeDropout: non-BMP characters are single symbols " +
    "(code-point seeding, all paths)") {
    val clef = "𝄞" // U+1D11E MUSICAL SYMBOL G CLEF, non-BMP
    val docs = Seq((1L, s"a${clef}b a${clef}b")).toDF("doc_id", "text")
    // no merge applies: 4 symbols per word (a, 𝄞, b, </w>) — a UTF-16
    // code-unit split would shatter 𝄞 and count 5
    val enc = TextPipeline.bpeEncode(docs, "doc_id", "text", Seq(("q", "q")))
      .as[(Long, Long, Long)].collect().toSeq
    assert(enc === Seq((1L, 2L, 8L)))
    // and a merge whose LEFT is the non-BMP char fires (it never could on
    // lone surrogates), on both the kernel and the literal fold
    for (fl <- Seq(None, Some(true))) {
      val d = TextPipeline.bpeEncodeDropout(docs, "doc_id", "text",
          Seq((clef, "b")), 0L, forceLiteral = fl)
        .as[(Long, Long, Long, String)].collect().head
      assert(d._3 === 6L, s"forceLiteral=$fl") // a, 𝄞b, </w> per word
      assert(d._4.contains(clef + "b"))
    }
  }

  test("bpeEncode: kernel (dropMille=0 degenerate), batched, and per-merge " +
    "folds are bit-identical on a trained merge table") {
    val docs = bigPseudoDocs
    val merges = TextPipeline.bpeTrainBatched(docs, "text", nMerges = 96,
      batch = 16).map { case (_, l, r, _) => (l, r) }
    assert(TextPipeline.batchMerges(merges).size < merges.size,
      "trained table must actually batch somewhere")
    def run(fl: Option[Boolean], lb: Boolean = true) =
      TextPipeline.bpeEncode(docs, "doc_id", "text", merges,
          forceLiteral = fl, literalBatched = lb)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val kernel = run(None)
    assert(kernel === run(Some(true), lb = true), "kernel vs batched")
    assert(kernel === run(Some(true), lb = false), "kernel vs per-merge")
  }

  test("minCostEncode: the indexed prefix/continuation kernel is " +
    "BIT-identical to the literal fold, UNK words included, both fixtures") {
    val docs = Seq(
      (1L, "abab zq baba unseg ab"),
      (2L, "aa bb abab zq zq")).toDF("doc_id", "text")
    val vocab = Seq(("a", 7L), ("ab", 9L), ("##b", 3L), ("##ab", 5L),
      ("zq", 2L), ("##a", 4L), // 'unseg', 'bb', 'aa' are UNK (no 'b' initial)
      ("##b", 30L), ("zq", 1L)) // DUPLICATES: the literal relaxes over every
                                // copy (min), the kernel keeps the cheaper —
                                // WpVocab ships a real '##s' duplicate
    def run(d: org.apache.spark.sql.DataFrame, v: Seq[(String, Long)],
            forced: Boolean) =
      TextPipeline.minCostEncode(d, "doc_id", "text", v, unkCost = 1000L,
          forceIndexed = Some(forced))
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(docs, vocab, forced = false) === run(docs, vocab, forced = true))
    // trained-vocab regime (qfj's adapter: every piece bare + ##-prefixed)
    val big = bigPseudoDocs
    val trained = TextPipeline.unigramTrain(big, "text", maxPieceLen = 5,
      seedMulti = 400, iters = 1).filter(_._1 == 1)
      .flatMap { case (_, p, _, cnt) =>
        val c = 1000000L / (1L + cnt); Seq((p, c), ("##" + p, c)) }
    assert(run(big, trained, forced = false) === run(big, trained, forced = true))
  }

  test("altCostFn: the substring-probe inversion scores exactly like the " +
    "quadratic iterate-the-whole-map reference, self-exclusion included") {
    // vocab with nested/overlapping pieces, incl. a piece that is its own
    // only cover (must hit the INF sentinel through self-exclusion)
    val rnd = new scala.util.Random(7)
    val alpha = "abc"
    val pieces = (Seq("a", "b", "c") ++ (0 until 120).map { _ =>
      (0 until (2 + rnd.nextInt(3))).map(_ => alpha(rnd.nextInt(3))).mkString
    } :+ "zz").distinct
    val costMap = pieces.map(p => p -> (50L + rnd.nextInt(1000))).toMap
    def quad(p: String): Long = { // the pre-round-15 loop, verbatim
      val n = p.length
      val dp = Array.fill(n + 1)(Long.MaxValue / 4); dp(0) = 0L
      for (i <- 1 to n; (q, qc) <- costMap
           if q != p && q.length <= i && p.substring(i - q.length, i) == q)
        dp(i) = math.min(dp(i), dp(i - q.length) + qc)
      dp(n)
    }
    val alt = TextPipeline.altCostFn(costMap)
    pieces.foreach { p =>
      assert(alt(p) === quad(p), s"altCost('$p') diverges")
    }
    // 'zz': no other piece covers 'z' — both must return the sentinel
    assert(alt("zz") === Long.MaxValue / 4)
  }

  test("unigramSampleEncode: the lattice-coverage guard is lazy (composing " +
    "runs no job, fails at action time) and exact (multi-char tilings pass)") {
    val docs = Seq((1L, "abab xx")).toDF("doc_id", "text")
    // uncovered: no piece ever matches inside "xx" — composing must NOT
    // throw (the pre-round-15 eager check ran a Spark job per call);
    // the action must fail with the lattice message
    val bad = TextPipeline.unigramSampleEncode(docs, "doc_id", "text",
      Seq(("a", 5000000L), ("b", 3000000L), ("ab", 2000000L)))
    val ex = intercept[Exception] { bad.collect() }
    assert(ex.getMessage.contains("empty segmentation lattice"))
    // exact condition: a vocab tiling every word with MULTI-char pieces
    // alone (no single-char coverage) is legitimate and must sample
    val ok = TextPipeline.unigramSampleEncode(
        Seq((1L, "abab ab")).toDF("doc_id", "text"), "doc_id", "text",
        Seq(("ab", 2000000L), ("abab", 800000L)))
      .as[(Long, Long, Long, String)].collect()
    assert(ok.length === 1)
    assert(ok.head._4.replace("\u001f", "") === "abab ab")
  }
}
