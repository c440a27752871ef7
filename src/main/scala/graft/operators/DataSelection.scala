package graft.operators

import graft.functions.{Fnv1a64Expr, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance-based training-data selection over hashed n-gram features —
  * the DSIR recipe (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023) re-expressed as exact integer
  * arithmetic so the whole selection replays bit-for-bit in an external
  * SQL oracle.
  *
  * The idea: score every RAW-pool document by how much its hashed-unigram
  * distribution looks like a small TARGET corpus (the domain you want more
  * of), then keep the top-k. DSIR's per-feature signal is the log-ratio
  * log p_target(f) − log p_raw(f); logs are transcendental and would tie
  * correctness to libm rounding, so this implementation uses the
  * integer-exact surrogate
  *
  *   ilr(f) = floor( scale · (n_t(f)+1)·(N_r+B) / ((n_r(f)+1)·(N_t+B)) )
  *
  * — the add-one-smoothed frequency RATIO (not its log), floor-scaled to
  * a long. It is monotone in the per-feature ratio, so per-feature
  * evidence ranks identically; a document's score sums ilr over its
  * feature tokens (sum-of-ratios rather than DSIR's sum-of-log-ratios —
  * the deterministic trade the tokenizer/LM gates make throughout this
  * repo). Selection is the top-k by per-token mean score, ties to the
  * lower id.
  *
  * Shape at 100 TB: one pass computes per-bucket target/raw counts with
  * map-side partial aggregation (each partition collapses to ≤ B rows
  * before the shuffle — the only shuffle here, B rows wide). The B-entry
  * ratio table is model-scale and ships to executors as a map literal
  * (same discipline as the IVF centroid broadcast), so scoring is a
  * per-row HOF fold over the document's own tokens — zero corpus shuffle —
  * and the top-k is TakeOrdered (per-partition heaps, driver merge of
  * k·P candidates, no global sort). `buckets` must be a power of two:
  * 2^64 ≡ 0 (mod B) makes the signed pmod here equal the oracle's
  * unsigned mod, and the hash-sketch geometry wants it anyway.
  *
  * Capability analogue of the reference's grouped-aggregate + broadcast
  * scoring surface (flink-libraries/flink-ml pipeline estimators); the
  * selection itself is an LLM-pipeline extension per the project brief. */
object DataSelection {

  private def bucketCol(tok: Column, buckets: Int): Column =
    pmod(Fnv1a64Expr(tok), lit(buckets.toLong)).cast("int")

  /** Per-document hashed-unigram bucket ids (duplicates kept — counts are
    * the feature values). */
  def featureBuckets(text: Column, buckets: Int): Column =
    transform(TextFunctions.tokens(text), t => bucketCol(t, buckets))

  /** The integer-exact importance table: bucket → ilr as defined above.
    * Computed with BigInt intermediates so the scaled products cannot
    * silently wrap; the result must fit a long (it does whenever the
    * scaled ratio itself does — require'd, not truncated). */
  def dsirIlrTable(docs: DataFrame, textCol: String, isTarget: Column,
                   buckets: Int, scale: Long = 1000000L): Map[Int, Long] = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val counts = docs
      .select(isTarget.as("is_t"), explode(featureBuckets(col(textCol), buckets)).as("b"))
      .groupBy(col("b"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("nt"),
        sum(when(col("is_t"), 0L).otherwise(1L)).as("nr"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val totT = BigInt(counts.valuesIterator.map(_._1).sum) + buckets
    val totR = BigInt(counts.valuesIterator.map(_._2).sum) + buckets
    (0 until buckets).map { b =>
      val (nt, nr) = counts.getOrElse(b, (0L, 0L))
      val v = (BigInt(nt + 1) * totR * scale) / (BigInt(nr + 1) * totT)
      require(v.isValidLong, s"ilr($b) = $v overflows long; lower scale")
      b -> v.toLong
    }.toMap
  }

  /** Semantic-DIVERSITY selection: cluster the corpus by embedding with
    * the deterministic integer k-means ([[ML.kMeansScaled]] — the same
    * trainer behind the IVF partitioners), then keep an equal per-cell
    * quota, ranked inside each cell by the salted content hash (ties to
    * the lower id). Where [[dsirSelect]] pulls the pool TOWARD a target
    * distribution, this spreads the selection ACROSS the embedding space
    * — the standard counterweight to importance selection collapsing
    * onto one mode (cluster-balanced curation à la SemDeDup's diversity
    * pass).
    *
    * Shape at 100 TB: k-means is per-round one k-row centroid broadcast
    * + a narrow argmin + one (cell, dim) aggregate; the quota pass is a
    * single window over cell_id — one shuffle keyed by k cells. Skewed
    * cells are bounded by perCell, so the window's per-partition state
    * is the quota, not the cell population (rank + filter fuse; rows
    * past the quota stream through). Deterministic end to end, so the
    * oracle replays assignment AND quota. */
  def clusterBalancedSelect(df: DataFrame, idCol: String, vecCol: String,
                            k: Int, iters: Int, perCell: Int,
                            salt: String = "diverse"): DataFrame = {
    require(perCell >= 1)
    val asg = ML.kMeansScaled(df, idCol, vecCol, k, iters).assignments
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cell_id"))
      .orderBy(Sampling.unitHash(col(idCol), salt), col(idCol))
    asg.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perCell)
      .select(col(idCol), col("cell_id"), col("rk"))
  }

  /** SSL-prototype pruning (Sorscher et al. 2022 "Beyond neural scaling
    * laws"; the prototypicality stage of D4): per embedding cluster, the
    * examples CLOSEST to their centroid are the easy/redundant ones —
    * rank each cell by cosine to centroid descending (most prototypical
    * first, raw cosine so both engines order identically — the qg5
    * device, ties to the lower id) and DROP the top `dropFrac` fraction
    * (ceil(dropFrac·n_cell) rows), keeping the informative tail. The
    * removal counterpart of [[Dedup.semDedupSelect]]'s keep rule: where
    * SemDeDup removes duplicate GROUPS, prototype pruning thins every
    * cell by example difficulty.
    *
    * Assignment and centroids come from the same deterministic
    * partitioner family: zero-refinement lowest-id-sample cells, or
    * `refineIters > 0` Lloyd rounds via [[ML.kMeansScaled]] (quantized
    * centroids score fine — cosine is scale-invariant).
    *
    * Output: (idCol, cell_id, centroid_cos, proto_rank, is_kept), one
    * row per vector.
    *
    * Shape at 100 TB: one narrow assignment pass against a broadcast
    * k-row centroid frame, one window keyed on cell_id (k cells — the
    * shuffle key count is the cluster count, and nCells grows with the
    * corpus exactly as in the SemDeDup family). No pairwise work. */
  def prototypePrune(emb: DataFrame, idCol: String, vecCol: String,
                     nCells: Int, dropFrac: Double,
                     refineIters: Int = 0): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac <= 1.0, s"dropFrac=$dropFrac out of [0,1]")
    import org.apache.spark.sql.expressions.Window
    val c = emb.select(col(idCol).as("_vid"), col(vecCol).as("_vec"))
    val assigned = if (refineIters > 0) {
      val km = ML.kMeansScaled(emb, idCol, vecCol, nCells, refineIters)
      c.join(km.assignments.select(col(idCol).as("_vid"), col("cell_id")), "_vid")
        .join(broadcast(km.centroids.select(col("cell_id"),
          transform(col("cvec"), x => x.cast("float")).as("centroid"))),
          Seq("cell_id"))
        .select(col("cell_id"), col("_vid"), col("_vec"), col("centroid"))
    } else {
      val cents = c.orderBy(col("_vid")).limit(nCells)
        .select(col("_vid").as("cell_id"), col("_vec").as("centroid"))
      val aw = Window.partitionBy("_vid").orderBy(col("cdist").asc, col("cell_id"))
      c.crossJoin(broadcast(cents))
        .withColumn("cdist", graft.functions.VectorFunctions
          .squaredEuclidean(col("_vec"), col("centroid")))
        .withColumn("r", row_number().over(aw)).filter(col("r") === 1)
        .select(col("cell_id"), col("_vid"), col("_vec"), col("centroid"))
    }
    val scored = assigned.withColumn("centroid_cos", graft.functions
      .VectorFunctions.cosineSimilarityFast(col("_vec"), col("centroid")))
    val win = Window.partitionBy(col("cell_id"))
      .orderBy(col("centroid_cos").desc, col("_vid"))
    val sized = Window.partitionBy(col("cell_id"))
    scored
      .withColumn("proto_rank", row_number().over(win).cast("long"))
      .withColumn("_n", count(lit(1)).over(sized))
      .withColumn("is_kept",
        col("proto_rank") > ceil(lit(dropFrac) * col("_n")).cast("long"))
      .select(col("_vid").as(idCol), col("cell_id"), col("centroid_cos"),
        col("proto_rank"), col("is_kept"))
  }

  /** GPT-3-style stochastic quality filtering (Brown et al. 2020,
    * Appendix A): score every raw-pool document with a quality
    * classifier trained target-vs-raw, then keep it iff
    *
    *   quality > 1 − pareto(α) draw,   α = 9 in the paper
    *
    * so high-quality documents are (almost) always kept while
    * low-quality ones still enter the mix with heavy-tailed probability
    * — the published alternative to a hard threshold. Everything is
    * integer-exact:
    *
    *  - the classifier is the hashed-unigram ratio model of
    *    [[dsirIlrTable]] (per-token mean scaled ratio r̄ = avg_ilr /
    *    scale), mapped to the NB posterior under a 50/50 prior,
    *    q = r̄/(1+r̄), held in millis: q_milli = 1000·avg_ilr DIV
    *    (scale + avg_ilr) ∈ [0, 1000);
    *  - the Pareto draw comes from the top 20 bits of the salted id
    *    hash, u = draw_bits / 2^20, via the inverse CDF
    *    draw = u^(−1/α) − 1; and
    *  - `q > 1 − draw  ⇔  u < (2−q)^(−α)  ⇔
    *    draw_bits · (2000 − q_milli)^α < 2^20 · 1000^α` — an EXACT
    *    integer comparison (≤ 5.4e35 at α = 9: inside Spark's
    *    decimal(38) and the oracle's HUGEINT), no libm anywhere.
    *    draw_bits = 0 (u = 0, infinite draw) keeps by the same
    *    comparison — 0 < RHS.
    *
    * Output: (idCol, n_feat, avg_ilr, q_milli, draw_bits, is_kept), one
    * row per raw-pool document with ≥ 1 token (zero-token docs carry no
    * classifier evidence and are excluded, as in [[dsirSelect]]).
    *
    * Shape at 100 TB: identical to [[dsirSelect]] minus the top-k — one
    * feature-count aggregate for the B-entry table (broadcast literal),
    * then a pure map-side scan: score, quality, draw, verdict all fuse
    * into the row pass; zero shuffles, zero driver round-trips. */
  def paretoQualitySelect(docs: DataFrame, idCol: String, textCol: String,
                          isTarget: Column, buckets: Int = 512,
                          alpha: Int = 9, scale: Long = 1000000L,
                          salt: String = "pareto"): DataFrame = {
    require(alpha >= 1 && alpha <= 9,
      s"alpha must be in [1, 9] (integer-overflow bound), got $alpha")
    val ilr = typedLit(dsirIlrTable(docs, textCol, isTarget, buckets, scale))
    // 2^20 · 1000^alpha as an exact decimal literal
    val rhs = lit(new java.math.BigDecimal(
      ((BigInt(1) << 20) * BigInt(1000).pow(alpha)).bigInteger))
    val pow = (1 until alpha).foldLeft(col("_base").cast("decimal(4,0)")) {
      (acc, _) => acc * col("_base").cast("decimal(4,0)")
    }
    docs.filter(!isTarget)
      .select(col(idCol), featureBuckets(col(textCol), buckets).as("bks"))
      .select(col(idCol), size(col("bks")).cast("long").as("n_feat"),
        aggregate(col("bks"), lit(0L), (acc, b) => acc + element_at(ilr, b))
          .as("score"))
      .filter(col("n_feat") > 0)
      .withColumn("avg_ilr", expr("score DIV n_feat"))
      .withColumn("q_milli", expr(s"(1000L * avg_ilr) DIV (${scale}L + avg_ilr)"))
      .withColumn("draw_bits", shiftrightunsigned(
        Fnv1a64Expr(concat(col(idCol).cast("string"), lit(":" + salt))), 44))
      .withColumn("_base", lit(2000L) - col("q_milli"))
      .withColumn("is_kept",
        (col("draw_bits").cast("decimal(7,0)") * pow) < rhs)
      .select(col(idCol), col("n_feat"), col("avg_ilr"), col("q_milli"),
        col("draw_bits"), col("is_kept"))
  }

  /** Select the `k` raw-pool documents (rows where `isTarget` is false)
    * whose hashed-unigram mix best matches the target corpus. Output:
    * (idCol, n_feat, score, avg_ilr), the top-k by (avg_ilr desc, id asc);
    * zero-token documents carry no evidence and are excluded. */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, buckets: Int = 512, k: Int = 100,
                 scale: Long = 1000000L): DataFrame = {
    require(k >= 1)
    val ilr = typedLit(dsirIlrTable(docs, textCol, isTarget, buckets, scale))
    docs.filter(!isTarget)
      .select(col(idCol), featureBuckets(col(textCol), buckets).as("bks"))
      .select(col(idCol), size(col("bks")).cast("long").as("n_feat"),
        aggregate(col("bks"), lit(0L), (acc, b) => acc + element_at(ilr, b))
          .as("score"))
      .filter(col("n_feat") > 0)
      .withColumn("avg_ilr", expr("score DIV n_feat"))
      .orderBy(col("avg_ilr").desc, col(idCol))
      .limit(k)
  }
}
