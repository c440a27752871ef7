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
