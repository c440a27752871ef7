package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarityExpr

/** Cross-modal pair curation — the LAION/DataComp recipe family
  * (Schuhmann et al., LAION-400M/5B; Gadre et al., DataComp 2023): a
  * web-scale image-text corpus arrives as CANDIDATE (image, caption)
  * pairs, and the curation pipeline (a) scores each pair by the cosine
  * between the two modality embeddings (the "CLIP score"), (b) drops
  * pairs below an alignment threshold (LAION-400M used 0.3 on CLIP
  * ViT-B/32 scores), and (c) when several candidate captions survive
  * for one image, keeps the best-aligned caption so the training set
  * has one text per image (capability analogue of SURVEY §2's
  * LLM-pipeline selection family; the embeddings are produced upstream
  * — this engine curates, it does not run the encoder).
  *
  * Shape at 100 TB: both faces are embarrassingly parallel —
  * [[alignPairs]] is one codegen'd scalar pass (the cosine is
  * [[graft.functions.CosineSimilarityExpr]], a native expression inside
  * whole-stage codegen, never a UDF boundary), and
  * [[keepBestAlignedPerImage]] adds one image-keyed shuffle whose
  * groups are candidate captions per image — bounded small by
  * construction (crawlers attach a handful of alt-texts/titles per
  * image), so the per-image window never skews. */
object CrossModal {

  /** Score candidate pairs and attach the keep/drop verdict: adds
    * `cos_sim` (embedding cosine, 6-decimal-rounded so the threshold
    * cut replays identically in any engine — the q88/qb9 device) and
    * `is_aligned` (cos_sim >= threshold). Both vector columns must be
    * `array<float>` (the storage type embeddings ship in); the scalar
    * kernel fuses into whole-stage codegen. Rows are NOT dropped — the
    * verdict column keeps the audit trail (how much the threshold
    * removes is itself a curation report); filter on `is_aligned` for
    * the kept set. */
  def alignPairs(pairs: DataFrame, imgVecCol: String, capVecCol: String,
                 threshold: Double): DataFrame =
    pairs
      .withColumn("cos_sim",
        round(CosineSimilarityExpr(col(imgVecCol), col(capVecCol)), 6))
      .withColumn("is_aligned", col("cos_sim") >= threshold)

  /** Keep the BEST-aligned caption per image among surviving
    * candidates — the aligned-pair dedup half of the recipe, expressed
    * through [[Dedup.keepBestRepresentatives]]: candidates of one image
    * are chained into one duplicate cluster (rank-consecutive edges —
    * n-1 edges per image, never a quadratic within-image self-join) and
    * the cluster representative is the highest-`score` candidate (ties
    * to the smaller id). Cluster identity is the min candidate id, so
    * output clusters are comparable with the min-id dedup variants.
    *
    * `score` should be the ROUNDED alignment score ([[alignPairs]]'s
    * `cos_sim`) — ranking on a raw double can flip order across engines
    * on last-ulp differences.
    *
    * Output: (idCol, cluster_id, score, is_kept), one row per input
    * candidate. */
  def keepBestAlignedPerImage(aligned: DataFrame, idCol: String,
                              imgIdCol: String, score: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(imgIdCol)).orderBy(col(idCol))
    val ranked = aligned.select(col(idCol), col(imgIdCol))
      .withColumn("_rk", row_number().over(w))
    val edges = ranked.as("a").join(ranked.as("b"),
        col(s"a.$imgIdCol") === col(s"b.$imgIdCol") &&
          col("a._rk") === col("b._rk") - 1)
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
    Dedup.keepBestRepresentatives(aligned, idCol, edges, score)
  }
}
