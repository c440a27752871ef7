package graft

import graft.streaming.IterateStream
import org.apache.spark.sql.functions._

/** Streaming iterations (streaming/IterateStream.scala): the feedback
  * file-source loop — fixpoint exactness on handcrafted and randomized
  * graphs, loop termination, and replay/no-op behavior of the ledgered
  * drive. */
class StreamIterationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("streamiter").toFile.getAbsolutePath

  test("ssspToFixpoint: exact distances on a handcrafted weighted digraph") {
    // 1 -5-> 2, 1 -2-> 3, 3 -2-> 2, 2 -1-> 4, 3 -7-> 4 ; 6 -1-> 5 unreachable
    val edges = Seq((1L, 2L, 5L), (1L, 3L, 2L), (3L, 2L, 2L), (2L, 4L, 1L),
      (3L, 4L, 7L), (6L, 5L, 1L)).toDF("src", "dst", "wt")
    val got = IterateStream.ssspToFixpoint(edges, root = 1L, tmp())
      .as[(Long, Long)].collect().toMap
    // shortest: 2 via 1->3->2 = 4 (beats direct 5); 4 via 3->2->4 = 5
    assert(got === Map(1L -> 0L, 3L -> 2L, 2L -> 4L, 4L -> 5L))
  }

  test("ssspToFixpoint equals brute Bellman-Ford on a randomized digraph") {
    val rnd = new scala.util.Random(101L)
    val n = 24
    val es = (for (_ <- 1 to 70) yield
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, (1 + rnd.nextInt(9)).toLong))
      .filter(e => e._1 != e._2).distinct
    // brute fixpoint in plain Scala
    val INF = Long.MaxValue / 4
    val dist = Array.fill(n)(INF)
    dist(0) = 0L
    var changed = true
    while (changed) {
      changed = false
      es.foreach { case (a, b, w) =>
        if (dist(a.toInt) + w < dist(b.toInt)) {
          dist(b.toInt) = dist(a.toInt) + w; changed = true
        }
      }
    }
    val want = dist.zipWithIndex.collect {
      case (d, i) if d < INF => (i.toLong, d)
    }.toMap
    val got = IterateStream.ssspToFixpoint(es.toDF("src", "dst", "wt"),
        root = 0L, tmp())
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("connectedComponentsStream labels a multi-component graph exactly") {
    // components: {1,2,3,7}, {4,5}, {6,8}
    val ue = Seq((1L, 2L), (2L, 3L), (3L, 7L), (4L, 5L), (6L, 8L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("a", "b")
    val got = graft.streaming.IterateStream
      .connectedComponentsStream(ue, tmp())
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L, 8L -> 6L))
  }

  test("pageRankStream (bulk-synchronous loop) is row-identical to the " +
    "batch driver loop on a randomized digraph") {
    val rnd = new scala.util.Random(77L)
    val es = (for (_ <- 1 to 60) yield
      (rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
      .filter(e => e._1 != e._2).distinct
    val edges = es.toDF("src", "dst")
    val got = graft.streaming.IterateStream
      .pageRankStream(edges, iters = 6, tmp())
      .as[(Long, Long)].collect().toSet
    val want = graft.operators.GraphOps.pageRankScaled(edges, iters = 6)
      .as[(Long, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
  }

  test("pageRankStream absorbs a double-appended feedback round (the " +
    "at-least-once append-before-ledger crash window)") {
    // The drive's replay window re-appends one round's feedback; the BSP
    // body is stateless and non-monotone, so without the route's
    // (node, iter) dedup the duplicated frontier would double the summed
    // contributions. Simulate the window at round 0: plant an extra copy
    // of the initial frontier in the feedback dir BEFORE the loop starts,
    // so its first batch sees every (node, rank, iter=0) row twice.
    val rnd = new scala.util.Random(55L)
    val es = (for (_ <- 1 to 50) yield
      (rnd.nextInt(14).toLong, rnd.nextInt(14).toLong))
      .filter(e => e._1 != e._2).distinct
    val edges = es.toDF("src", "dst")
    val dir = tmp()
    val verts = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
    IterateStream.seed(
      verts.select(col("node").cast("long").as("node"),
        lit(1000000L).as("rank"), lit(0).as("iter")),
      s"$dir/feedback")
    val got = IterateStream.pageRankStream(edges, iters = 4, dir)
      .as[(Long, Long)].collect()
    val want = graft.operators.GraphOps.pageRankScaled(edges, iters = 4)
      .as[(Long, Long)].collect().toSet
    // set-equal AND no duplicated output rows
    assert(got.toSet === want && got.nonEmpty)
    assert(got.length === got.toSet.size)
  }

  test("pageRankStream output dedups a replayed FINAL round") {
    // Other end of the window: the duplicate append lands on the LAST
    // round, so rounds/ carries the iter==iters rows twice and only the
    // final-read dedup stands between the loop and duplicated output.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val dir = tmp()
    val clean = IterateStream.pageRankStream(edges, iters = 3, tmp())
      .as[(Long, Long)].collect().toSet
    val got0 = IterateStream.pageRankStream(edges, iters = 3, dir)
      .as[(Long, Long)].collect().toSet
    assert(got0 === clean)
    // plant the duplicate: re-append the final round's rows as feedback
    // (exactly what a crashed-after-append drive leaves behind), then
    // re-read through the same final-read path the API uses
    val finalRows = spark.read.parquet(s"$dir/out/rounds")
      .filter(col("iter") === 3)
    val extraBid = spark.read.parquet(s"$dir/out/rounds")
      .select(max(col("batch_id").cast("long"))).head().getLong(0) + 1
    finalRows.select("node", "rank", "iter").write.mode("overwrite")
      .parquet(s"$dir/out/rounds/batch_id=$extraBid")
    val reread = IterateStream.finalRound(spark, s"$dir/out", 3)
      .as[(Long, Long)].collect()
    assert(reread.toSet === clean && reread.length === clean.size)
  }

  test("pageRankStream resumes a REAL mid-loop crash to the batch " +
    "driver loop's exact ranks (the armor in the live window)") {
    val rnd = new scala.util.Random(909L)
    val es = (for (_ <- 1 to 40) yield
      (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(e => e._1 != e._2).distinct
    val edges = es.toDF("src", "dst")
    val dir = tmp()
    val crashed = try {
      IterateStream.pageRankStreamImpl(edges, iters = 5, dir,
        loopStatePartitions = 4, crashAfterRounds = 2).count()
      false
    } catch { case _: Throwable => true }
    assert(crashed, "injected crash did not fire")
    // resume over the same work dir: the failed batch replays (its
    // feedback possibly double-appended — the exact window the route
    // armor covers) and the fresh re-seed's iter=0 rows are dropped by
    // the newest-round filter
    val got = IterateStream.pageRankStream(edges, iters = 5, dir)
      .as[(Long, Long)].collect()
    val want = graft.operators.GraphOps.pageRankScaled(edges, iters = 5)
      .as[(Long, Long)].collect().toSet
    assert(got.toSet === want && got.length === want.size)
  }

  test("resume after a crash at EVERY round reaches the same fixpoint " +
    "(exhaustive in-process sweep of the crash window)") {
    // chain 1->2->...->6: five relax rounds to fixpoint; inject the crash
    // after round r for every r, resume in-process over the same work
    // dir, and require the exact distances every time
    val edges = (1L until 6L).map(i => (i, i + 1, 1L)).toDF("src", "dst", "wt")
    val want = (1L to 6L).map(i => i -> (i - 1L)).toMap
    for (r <- 1 to 4) {
      val dir = tmp()
      val seeds = Seq((1L, 0L)).toDF("node", "dist")
      val crashed = try {
        IterateStream.minFixpointImpl(edges, seeds, dir,
          loopStatePartitions = 4, crashAfterRounds = r).count()
        false
      } catch { case _: Throwable => true }
      assert(crashed, s"crash after round $r did not fire")
      val got = IterateStream.ssspToFixpoint(edges, root = 1L, dir)
        .as[(Long, Long)].collect().toMap
      assert(got === want, s"resume after crash at round $r diverged")
    }
  }

  test("a re-seeded non-improving frontier terminates without emitting") {
    val edges = Seq((1L, 2L, 3L)).toDF("src", "dst", "wt")
    val dir = tmp()
    val first = IterateStream.ssspToFixpoint(edges, root = 1L, dir)
      .as[(Long, Long)].collect().toSet
    assert(first === Set((1L, 0L), (2L, 3L)))
    val rounds0 = spark.read.parquet(s"$dir/out/rounds")
      .select(input_file_name()).distinct().count()
    // second call over the SAME work dir: re-seeds (root, 0), which the
    // per-node min state rejects — the loop must drain after one empty
    // round, emit nothing new, and leave the improvement history intact
    val second = IterateStream.ssspToFixpoint(edges, root = 1L, dir)
      .as[(Long, Long)].collect().toSet
    assert(second === first)
    assert(spark.read.parquet(s"$dir/out/rounds")
      .select(input_file_name()).distinct().count() === rounds0)
  }
}
