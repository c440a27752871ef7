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
