package graft

import graft.operators.CrossModal
import org.apache.spark.sql.functions._

/** Pins the cross-modal pair-curation contract (operators/CrossModal.scala):
  * alignment verdicts at the threshold boundary, audit-trail row
  * preservation, and the best-caption-per-image selection semantics
  * (cluster identity, score ranking, id tie-break, singleton images). */
class CrossModalSpec extends SparkSpec {

  private def vec(xs: Float*): Array[Float] = xs.toArray

  test("alignPairs: rounded-cosine verdicts, >= at the boundary, rows kept") {
    import spark.implicits._
    val pairs = Seq(
      // identical vectors: cos 1.0
      (0L, 10L, vec(1f, 0f), vec(1f, 0f)),
      // orthogonal: cos 0.0
      (1L, 10L, vec(1f, 0f), vec(0f, 1f)),
      // 45 degrees: cos ~0.707107
      (2L, 11L, vec(1f, 0f), vec(1f, 1f)),
      // opposite: cos -1.0
      (3L, 11L, vec(1f, 0f), vec(-1f, 0f))
    ).toDF("pair_id", "img_id", "img_vec", "cap_vec")
    val out = CrossModal.alignPairs(pairs, "img_vec", "cap_vec", 0.707107)
      .select("pair_id", "cos_sim", "is_aligned")
      .as[(Long, Double, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L), "no rows dropped")
    assert(out(0)._3 && !out(1)._3 && !out(3)._3)
    assert(out(2)._2 === 0.707107 && out(2)._3,
      "threshold is >= on the 6-decimal-rounded score")
  }

  test("keepBestAlignedPerImage: highest score wins per image, ties to the " +
    "smaller id, cluster id is the min candidate id, singletons kept") {
    import spark.implicits._
    // img 1: three candidates, distinct scores; img 2: tie on score;
    // img 3: singleton
    val aligned = Seq(
      (10L, 1L, 0.91), (11L, 1L, 0.99), (12L, 1L, 0.95),
      (20L, 2L, 0.97), (21L, 2L, 0.97),
      (30L, 3L, 0.88)
    ).toDF("pair_id", "img_id", "cos_sim")
    val out = CrossModal.keepBestAlignedPerImage(
        aligned, "pair_id", "img_id", col("cos_sim"))
      .select("pair_id", "cluster_id", "is_kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(r => r._1 -> r._2).toMap ===
      Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L,
        30L -> 30L), "cluster id = min candidate id per image")
    assert(out.filter(_._3).map(_._1).toSeq === Seq(11L, 20L, 30L),
      "best score wins; score tie goes to the smaller id; singleton kept")
  }
}
