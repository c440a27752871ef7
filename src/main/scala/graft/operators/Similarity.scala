package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column.
  *
  * Capability analogue of the reference's KNN (reference:
  * flink-libraries/flink-ml/.../ml/nn/KNN.scala — quadtree-blocked exact
  * KNN), re-expressed for Spark scale:
  *
  *  - [[bruteForceTopK]]: broadcast the (small) query set against the full
  *    corpus — one scan, no shuffle of the corpus, window top-k per query.
  *    This is the exact baseline and is the right plan whenever
  *    |queries| ≪ |corpus| (the common retrieval shape).
  *  - [[lshTopK]]: random-hyperplane LSH — corpus is bucketed once by sign
  *    bits, queries probe only their own bucket (and the plan still
  *    broadcasts the query side). Sub-linear candidate sets at 100 TB;
  *    recall controlled by nBits/nTables.
  *  - [[ivfTopK]]: IVF-style coarse quantization — corpus assigned to the
  *    nearest of `nCells` sampled centroid rows, queries probe `nProbe`
  *    nearest cells.
  *  - [[knnGraphLsh]] + [[graphTopK]]: graph-based ANN — a kNN graph
  *    bootstrapped from LSH bucket collisions, searched by iterative
  *    greedy expansion (the GNNS scheme of Hajebi et al., IJCAI'11, which
  *    is also the search phase of every HNSW/NSG-family index). The graph
  *    side completes the ANN ladder: bucket probing (LSH), cell probing
  *    (IVF), code scanning (PQ/IVFADC), and neighborhood walking (graph).
  */
object Similarity {

  /** Micro-quantized copy of a float-vector column: floor(x·1e6) per
    * dimension as Long. The shared exactness device of the ANN family
    * (see [[bucketsUdf]] and PQ): every distance downstream is exact
    * integer arithmetic, so any engine — the DuckDB correctness oracle
    * included — replays scores, tie-breaks, and traversal decisions
    * bit-for-bit. */
  private def microQuant(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000000L).cast("long"))

  /** Exact integer squared-L2 between two micro-quantized vectors.
    * Bounds: |x| ≲ 2 ⇒ per-dim diff² ≲ 1.6e13; at dim 64 the sum stays
    * below 1e15 — five orders inside Long range. */
  private def qdist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)

  /** Exact top-k cosine neighbors for each query row.
    * corpus: (idCol, vecCol); queries: (qidCol, vecCol). Self-pairs (same id)
    * are excluded. Ties broken by neighbor id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, qidCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cos", VectorFunctions.cosineSimilarityFast(col("cvec"), col("qvec")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }

  /** Hard-negative mining for embedding/contrastive training: for each
    * query, the `k` MOST similar corpus vectors strictly BELOW a
    * near-duplicate ceiling — similar enough to be hard, not so similar
    * they are positives/duplicates (the standard retrieval-training
    * negative selection; the ceiling is the same role as the dedup
    * threshold in the near-dup family). The ceiling compares the
    * 6-decimal-rounded cosine so the cut replays identically in any
    * engine; ranking uses the raw cosine like [[bruteForceTopK]].
    *
    * All-pairs brute scoring = the exact verification regime (q88's
    * shape: queries broadcast against one corpus scan); at corpus scale
    * feed candidates from the ANN ladder (lshTopK/ivfTopK with a larger
    * k) and apply the same ceiling + re-rank — the rule is unchanged. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, qidCol: String, k: Int,
                    maxSim: Double): DataFrame = {
    require(k > 0 && maxSim > -1.0 && maxSim <= 1.0)
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cos", VectorFunctions.cosineSimilarityFast(col("cvec"), col("qvec")))
      .filter(round(col("cos"), 6) < maxSim)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }

  /** Embedding-space decontamination — the semantic counterpart of the
    * shingle-overlap decontamination (qbf): drop TRAIN vectors whose
    * cosine against ANY benchmark vector reaches `threshold` (a
    * paraphrased eval item has no token overlap but sits next to its
    * source in embedding space). Every train row is returned with its
    * benchmark max-cosine and verdict, so the report doubles as the
    * audit artifact. The cut compares the 6-decimal-rounded cosine
    * (engine-replayable, same device as [[hardNegatives]]).
    *
    * Benchmark sets are small by nature — they broadcast against one
    * train scan (the q88/qbf shape), so the all-pairs form IS the
    * at-scale plan here, not just the verification regime; a huge
    * benchmark would move to the ANN-ladder candidates like
    * [[lshHardNegatives]]. */
  def semanticDecontaminate(train: DataFrame, benchmark: DataFrame,
                            idCol: String, vecCol: String,
                            threshold: Double): DataFrame = {
    require(threshold > -1.0 && threshold <= 1.0)
    val t = train.select(col(idCol).as("train_id"), col(vecCol).as("tvec"))
    val b = benchmark.select(col(idCol).as("bench_id"), col(vecCol).as("bvec"))
    t.crossJoin(broadcast(b))
      .withColumn("cos", round(
        VectorFunctions.cosineSimilarityFast(col("tvec"), col("bvec")), 6))
      .groupBy(col("train_id"))
      .agg(max(col("cos")).as("max_cos"))
      .withColumn("is_kept", col("max_cos") < threshold)
  }

  /** Rademacher (±1) hyperplane sign for plane (table, bit) at dimension
    * `i`: two Lehmer-generator steps on the flat index, parity of the
    * result. Pure small-integer arithmetic (no overflow below 2^47, no RNG
    * object), so ANY engine — the DuckDB correctness oracle included —
    * reproduces the same sign from the same formula. */
  @inline private def planeSign(flatIdx: Long): Long = {
    val x1 = (flatIdx * 48271L) % 2147483647L
    val x2 = (x1 * 48271L) % 2147483647L
    if ((x2 & 1L) == 1L) 1L else -1L
  }

  /** All (table, bucket) pairs for a vector in ONE compiled pass.
    *
    * Sign-random-projection with ±1 (Rademacher) planes over the vector
    * quantized to integer micro-units (floor(x * 1e6)): the whole bucket
    * computation is EXACT integer arithmetic — no float summation order,
    * no RNG state — so buckets are bit-reproducible across engines and
    * the DuckDB oracle can replay the candidate generation. Recall of
    * ±1 planes matches gaussian planes at the same nBits/nTables (both
    * are unbiased sign-random-projection families).
    *
    * A per-bit Catalyst expression (nTables × nBits × dim `element_at` terms)
    * exceeds the 64KB codegen method limit and falls back to interpreted
    * evaluation — ~100× slower. A single UDF over the array keeps the dot
    * products in tight JIT'd loops; the rest of the plan (explode → bucket
    * join) stays codegen'd. */
  private def bucketsUdf(dim: Int, nBits: Int, nTables: Int) = {
    udf { (v: Array[Float]) =>
      Array.tabulate(nTables) { t =>
        var bkt = 0L
        var b = 0
        while (b < nBits) {
          var dotp = 0L
          var i = 0
          val n = math.min(dim, v.length)
          while (i < n) {
            dotp += planeSign(((t * nBits + b) * dim + i + 1).toLong) *
              math.floor(v(i) * 1000000.0).toLong
            i += 1
          }
          if (dotp >= 0) bkt |= (1L << b)
          b += 1
        }
        (t, bkt)
      }.toSeq
    }
  }

  /** LSH-bucketed approximate top-k: query probes its bucket per table. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              qidCol: String, k: Int, dim: Int, nBits: Int = 12, nTables: Int = 4): DataFrame = {
    val cands = lshCandidateScores(corpus, queries, idCol, vecCol, qidCol,
      dim, nBits, nTables)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("nbr_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }

  /** The candidate-generation + scoring stage shared by [[lshTopK]] and
    * [[lshHardNegatives]]: bucket-join the sign-random-projection tables,
    * dedup multi-band collisions, score with the fused cosine kernel.
    * Returns (query_id, nbr_id, cos). */
  private def lshCandidateScores(corpus: DataFrame, queries: DataFrame,
                                 idCol: String, vecCol: String, qidCol: String,
                                 dim: Int, nBits: Int, nTables: Int): DataFrame = {
    val buckets = bucketsUdf(dim, nBits, nTables)
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("qvec"))
    val cb = c.select(col("*"), explode(buckets(col("cvec"))).as("tb"))
      .select(col("nbr_id"), col("cvec"), col("tb._1").as("tbl"), col("tb._2").as("bkt"))
    val qb = q.select(col("*"), explode(buckets(col("qvec"))).as("tb"))
      .select(col("query_id"), col("qvec"), col("tb._1").as("tbl"), col("tb._2").as("bkt"))
    cb.join(broadcast(qb), Seq("tbl", "bkt"))
      .filter(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"), col("cvec"), col("qvec"))
      .dropDuplicates("query_id", "nbr_id")
      .withColumn("cos", VectorFunctions.cosineSimilarityFast(col("cvec"), col("qvec")))
  }

  /** [[hardNegatives]] fed by the LSH ladder instead of the all-pairs
    * scan — the at-scale shape the hardNegatives scaladoc prescribes:
    * candidates come from the sign-random-projection bucket join (the
    * S-curve bounds per-query candidates), the same rounded-cosine
    * ceiling drops near-positives, and the survivors re-rank to the k
    * hardest. Same rule, sub-linear candidate generation. */
  def lshHardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                       vecCol: String, qidCol: String, k: Int, maxSim: Double,
                       dim: Int, nBits: Int = 12, nTables: Int = 4): DataFrame = {
    require(k > 0 && maxSim > -1.0 && maxSim <= 1.0)
    val cands = lshCandidateScores(corpus, queries, idCol, vecCol, qidCol,
        dim, nBits, nTables)
      .filter(round(col("cos"), 6) < maxSim)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("nbr_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }

  /** IVF-style approximate top-k: corpus assigned to nearest of nCells
    * centroids, queries probe the nProbe nearest cells. Initial centroids
    * are a deterministic sample (lowest-id rows); `refineIters` rounds of
    * Lloyd's k-means (assign → per-cell mean) tighten them — each round is
    * one assignment shuffle plus a tiny centroid aggregate. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              qidCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
              refineIters: Int = 0): DataFrame = {
    val cands = ivfCandidateScores(corpus, queries, idCol, vecCol, qidCol,
      nCells, nProbe, refineIters)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("nbr_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }

  /** The candidate-generation + scoring stage shared by [[ivfTopK]] and
    * [[ivfHardNegatives]] (the IVF sibling of [[lshCandidateScores]]):
    * assign the corpus to its nearest cell, route each query to its
    * `nProbe` nearest cells, score the probed cells' members with the
    * fused cosine kernel. Returns (query_id, nbr_id, cos). */
  private def ivfCandidateScores(corpus: DataFrame, queries: DataFrame,
                                 idCol: String, vecCol: String, qidCol: String,
                                 nCells: Int, nProbe: Int,
                                 refineIters: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cvec"))
    var cents = c.orderBy(col("nbr_id")).limit(nCells)
      .select(col("nbr_id").as("cell_id"), col("cvec").as("centroid"))
    for (_ <- 1 to refineIters) {
      val aw = Window.partitionBy("nbr_id").orderBy(col("cdist").asc, col("cell_id"))
      val assignedNow = c.crossJoin(broadcast(cents))
        .withColumn("cdist", VectorFunctions.squaredEuclidean(col("cvec"), col("centroid")))
        .withColumn("r", row_number().over(aw)).filter(col("r") === 1)
        .select(col("cell_id"), col("cvec"))
      cents = assignedNow
        .select(col("cell_id"), posexplode(col("cvec")))
        .groupBy("cell_id", "pos").agg(avg(col("col")).as("v"))
        .groupBy("cell_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
          x => x.getField("v").cast("float")).as("centroid"))
        .localCheckpoint()
    }
    val assignW = Window.partitionBy("nbr_id").orderBy(col("cdist").asc, col("cell_id"))
    val assigned = c.crossJoin(broadcast(cents))
      .withColumn("cdist", VectorFunctions.squaredEuclidean(col("cvec"), col("centroid")))
      .withColumn("r", row_number().over(assignW)).filter(col("r") === 1)
      .select(col("nbr_id"), col("cvec"), col("cell_id"))
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("qvec"))
    val probeW = Window.partitionBy("query_id").orderBy(col("cdist").asc, col("cell_id"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("cdist", VectorFunctions.squaredEuclidean(col("qvec"), col("centroid")))
      .withColumn("r", row_number().over(probeW)).filter(col("r") <= nProbe)
      .select(col("query_id"), col("qvec"), col("cell_id"))
    assigned.join(broadcast(probes), Seq("cell_id"))
      .filter(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"),
        VectorFunctions.cosineSimilarityFast(col("cvec"), col("qvec")).as("cos"))
  }

  /** [[hardNegatives]] fed by the IVF ladder — the second at-scale
    * candidate source the hardNegatives scaladoc prescribes (cell routing
    * bounds each query's candidates to its nProbe cells' members, where
    * [[lshHardNegatives]] bounds them by bucket collisions): the same
    * rounded-cosine ceiling drops near-positives, survivors re-rank to
    * the k hardest. Same rule, same outputs, different recall/cost curve
    * — IVF probes trade table count for cell count, so the two ladders
    * suit different corpus geometries (clustered vs scattered). */
  def ivfHardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                       vecCol: String, qidCol: String, k: Int, maxSim: Double,
                       nCells: Int = 16, nProbe: Int = 4,
                       refineIters: Int = 0): DataFrame = {
    require(k > 0 && maxSim > -1.0 && maxSim <= 1.0)
    val cands = ivfCandidateScores(corpus, queries, idCol, vecCol, qidCol,
        nCells, nProbe, refineIters)
      .filter(round(col("cos"), 6) < maxSim)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("nbr_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }

  /** Retrieval-quality metrics of an approximate ranking against an exact
    * relevance set — the evaluation stage every ANN/retrieval deployment
    * runs before trusting an index: per query,
    *
    *   recall@k = |approx ∩ exact| / k
    *   MRR      = 1 / rank of the first relevant result (0 if none)
    *   nDCG@k   = Σ_{relevant i} 1/log2(rank_i+1)  /  Σ_{i=1..hits} 1/log2(i+1)
    *
    * (binary gains; the ideal ranking packs all hits first). Inputs are
    * integer ranks and a membership join, so everything upstream of the
    * final ≤k-term float sums is exact; outputs are 6-decimal-rounded.
    *
    * Shape at scale: both inputs are top-k-bounded per query (k·|queries|
    * rows); the join and groupBy are on query_id — trivially small next to
    * the retrievers that produced them. */
  def rankingMetrics(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val lab = approx.select("query_id", "rank", "nbr_id")
      .join(exact.select(col("query_id"), col("nbr_id"), lit(1L).as("hit")),
        Seq("query_id", "nbr_id"), "left")
      .withColumn("hit", coalesce(col("hit"), lit(0L)))
    lab.groupBy("query_id")
      .agg(sum("hit").as("h"),
        sum(when(col("hit") === 1, lit(1.0) / log2(col("rank") + 1))
          .otherwise(0.0)).as("dcg"),
        min(when(col("hit") === 1, col("rank"))).as("minr"))
      .select(col("query_id"),
        round(col("h").cast("double") / k, 6).as("recall_at_k"),
        round(coalesce(lit(1.0) / col("minr"), lit(0.0)), 6).as("mrr_at_k"),
        round(when(col("h") === 0, 0.0).otherwise(col("dcg") /
          expr("""aggregate(sequence(1, cast(h as int)), cast(0 as double),
                  (a, i) -> a + 1.0 / log2(i + 1))""")), 6).as("ndcg_at_k"))
  }

  /** Reciprocal-rank fusion (Cormack & Clarke, SIGIR'09): combine bounded
    * rank lists from heterogeneous retrievers — e.g. lexical BM25 and
    * embedding cosine — without score calibration:
    *
    *   rrf(d) = Σ_r 1 / (kRrf + rank_r(d))   over rankers that returned d
    *
    * Rank positions are integers, so given identical input rankings every
    * engine reproduces the fused scores exactly (the sum is over ≤ |rankers|
    * doubles; with two rankers a single IEEE add). kRrf=60 is the paper's
    * constant.
    *
    * Shape at scale: each input is already a top-N-bounded retriever output
    * (the retrievers carry the data-scale work); fusion unions R·N rows —
    * kilobytes — so the groupBy is trivial and the fused list broadcasts
    * into whatever join follows. The corpus is never touched here. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val tagged = rankings.map(_.select(
      col(idCol), col(rankCol).cast("long").as("__r")))
    tagged.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(round(sum(lit(1.0) / (lit(kRrf) + col("__r"))), 6).as("rrf_score"),
        count(lit(1)).as("n_rankers"))
  }

  /** Approximate kNN graph over the corpus — the index structure every
    * graph-based ANN family (HNSW, NSG, GNNS) searches. Candidate pairs
    * come from LSH bucket collisions ([[bucketsUdf]] — the integer-exact
    * sign-random-projection device lshTopK uses), each node keeping its
    * `degree` nearest bucket-mates by exact integer quantized-L2 (ties by
    * neighbor id). Returns (src, dst) directed edges, ≤ degree per src.
    *
    * Determinism: buckets are exact integer arithmetic and distances are
    * [[qdist2]], so the edge set is bit-reproducible across engines — the
    * DuckDB oracle replays graph CONSTRUCTION, not just search.
    *
    * Shape at 100 TB: candidate generation is the banded self-join on
    * (table, bucket) — sub-quadratic, bounded by per-bucket occupancy
    * (tune nBits to corpus size exactly as lshTopK does); per-src top-k
    * is one window over the candidate set. The emitted edge list is
    * N·degree rows; write it bucketed by src so [[graphTopK]]'s per-round
    * neighbor expansions are shuffle-free point lookups. NN-descent
    * rounds (join edges with edges to propose neighbor-of-neighbor pairs,
    * re-prune per src) refine recall at one extra self-join each without
    * changing this shape. */
  def knnGraphLsh(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
                  degree: Int, nBits: Int = 6, nTables: Int = 8): DataFrame = {
    val buckets = bucketsUdf(dim, nBits, nTables)
    val base = corpus.select(col(idCol).as("id"), microQuant(col(vecCol)).as("w"),
      explode(buckets(col(vecCol))).as("tb"))
      .select(col("id"), col("w"), col("tb._1").as("tbl"), col("tb._2").as("bkt"))
    val pairs = base.select(col("id").as("src"), col("w").as("sw"), col("tbl"), col("bkt"))
      .join(base.select(col("id").as("dst"), col("w").as("dw"), col("tbl"), col("bkt")),
        Seq("tbl", "bkt"))
      .filter(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
      .withColumn("d", qdist2(col("sw"), col("dw")))
    val w = Window.partitionBy("src").orderBy(col("d").asc, col("dst").asc)
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= degree)
      .select("src", "dst")
  }

  /** One NN-descent refinement round (Dong, Moses & Li, WWW'11): the
    * candidate set for each node is its current neighbors, its REVERSE
    * neighbors, and its neighbors' neighbors; re-prune to the `degree`
    * nearest by exact integer quantized-L2 (ties by id). One round lifts
    * an LSH-bootstrapped graph's quality substantially because "a
    * neighbor of my neighbor is likely my neighbor" — the paper's whole
    * premise — and each round is two self-joins plus one window, the same
    * sub-quadratic shape as [[knnGraphLsh]] (candidates per node bounded
    * by degree² + 2·degree). Iterate for diminishing returns. */
  def nnDescentRound(corpus: DataFrame, idCol: String, vecCol: String,
                     graph: DataFrame, degree: Int): DataFrame = {
    val cw = corpus.select(col(idCol).as("id"), microQuant(col(vecCol)).as("w"))
    val hop = graph.select(col("src"), col("dst").as("mid"))
      .join(graph.select(col("src").as("mid"), col("dst")), Seq("mid"))
      .select("src", "dst")
    val rev = graph.select(col("dst").as("src"), col("src").as("dst"))
    val cand = graph.select("src", "dst").unionByName(hop).unionByName(rev)
      .filter(col("src") =!= col("dst")).dropDuplicates("src", "dst")
    val scored = cand
      .join(cw.select(col("id").as("src"), col("w").as("sw")), Seq("src"))
      .join(cw.select(col("id").as("dst"), col("w").as("dw")), Seq("dst"))
      .withColumn("d", qdist2(col("sw"), col("dw")))
    val w = Window.partitionBy("src").orderBy(col("d").asc, col("dst").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= degree)
      .select("src", "dst")
  }

  /** Graph-based approximate top-k: iterative greedy expansion over a kNN
    * graph (GNNS — Hajebi et al., IJCAI'11; the flat-graph equivalent of
    * an HNSW search layer). Per query: seed with the `entryPoints`
    * lowest-id corpus nodes, then for `rounds` rounds take the `beam`
    * best visited nodes (by exact integer quantized-L2, ties by node id)
    * and add all their graph neighbors to the visited set; finally return
    * the top-k visited, self excluded. Fixed rounds + full-beam expansion
    * (no early exit) keep the traversal a deterministic function of the
    * graph, so the oracle replays every hop.
    *
    * Shape at 100 TB: the visited frontier is
    * O(|queries|·(entryPoints + rounds·beam·degree)) — query-scale, never
    * corpus-scale. Each round does two point-lookup joins: beam→edges on
    * src (shuffle-free against a src-bucketed edge table) and
    * candidates→vectors on id (likewise bucketed). The corpus is never
    * scanned after graph construction — that is the entire point of
    * graph ANN at scale. The tiny query/entry frames broadcast. Each
    * round's visited set is localCheckpoint'd: it is query-scale rows,
    * and without it every later round re-executes all earlier rounds'
    * joins (the plan doubles per round).
    *
    * `excludeSelf` (default true) drops result rows where the corpus
    * node id equals the query id — the right behavior when queries ARE
    * corpus rows (self is a trivial distance-0 hit). It assumes queries
    * and corpus share one id space: with an EXTERNAL query-id space a
    * legitimate neighbor whose id collides with a query id would be
    * silently dropped — pass `excludeSelf = false` there. */
  def graphTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, qidCol: String, k: Int, graph: DataFrame,
                entryPoints: Int = 4, beam: Int = 6, rounds: Int = 3,
                excludeSelf: Boolean = true): DataFrame = {
    require(entryPoints >= 1 && beam >= 1 && rounds >= 1 && k >= 1)
    val cw = corpus.select(col(idCol).as("node"), microQuant(col(vecCol)).as("nw"))
    val q = queries.select(col(qidCol).as("query_id"), microQuant(col(vecCol)).as("qw"))
    val ent = corpus.select(col(idCol).as("node")).orderBy(col("node")).limit(entryPoints)
    var visited = q.crossJoin(broadcast(ent))
      .join(cw, Seq("node"))
      .select(col("query_id"), col("node"), qdist2(col("qw"), col("nw")).as("d"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val bw = Window.partitionBy("query_id").orderBy(col("d").asc, col("node").asc)
      val beamDf = visited.withColumn("rk", row_number().over(bw))
        .filter(col("rk") <= beam).select("query_id", "node")
      val expanded = beamDf.join(graph, col("node") === col("src"))
        .select(col("query_id"), col("dst").as("node"))
        .dropDuplicates("query_id", "node")
      val scored = expanded.join(cw, Seq("node")).join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("node"), qdist2(col("qw"), col("nw")).as("d"))
      visited = visited.unionByName(scored)
        .dropDuplicates("query_id", "node").localCheckpoint()
    }
    val fw = Window.partitionBy("query_id").orderBy(col("d").asc, col("node").asc)
    (if (excludeSelf) visited.filter(col("node") =!= col("query_id")) else visited)
      .withColumn("rank", row_number().over(fw)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("node").as("nbr_id"), col("d").as("dist"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings"): for
    * every side-A document, its best side-B counterpart scored by the
    * MARGIN — similarity normalized by the average similarity of each
    * endpoint's k nearest cross-side neighbors — which suppresses hub
    * vectors that plain cosine thresholds mis-mine. A pair survives when
    * it is the A-doc's argmax AND its margin clears `minMarginScaled`
    * (1e6-scaled; the paper's 1.05–1.06 regime).
    *
    * Integer-exact variant: vectors quantize to floor(x·1000) longs, the
    * similarity is the quantized dot product, and the margin is the
    * floor-divided ratio (2k·dot·1e6) DIV (sumTopK_A + sumTopK_B), with
    * negative-dot pairs excluded (both keeps the ratio's floor semantics
    * engine-identical and drops pairs no miner would emit). Everything
    * replays bit-for-bit in SQL.
    *
    * Like q8a/q84, the all-pairs cross join is the exact VERIFICATION
    * regime (gate-scale; excluded from sweeps' scale claims): at 100 TB
    * the candidate pairs come from the ANN ladder (LSH buckets, IVF
    * cells, or the qeh kNN graph) and this operator is the exact margin
    * scorer over those candidates — identical arithmetic, bounded fan-in. */
  def bitextMarginMine(df: DataFrame, idCol: String, vecCol: String,
                       isSideA: Column, k: Int = 4,
                       minMarginScaled: Long = 1050000L): DataFrame = {
    require(k >= 1 && minMarginScaled >= 0)
    val q = df.select(col(idCol).as("_id"), isSideA.as("_isa"),
      transform(col(vecCol), x => floor(x.cast("double") * 1000).cast("long")).as("_w"))
    val a = q.filter(col("_isa")).select(col("_id").as("a_id"), col("_w").as("wa"))
    val b = q.filter(!col("_isa")).select(col("_id").as("b_id"), col("_w").as("wb"))
    // eager localCheckpoint, not cache(): the three downstream passes read
    // the materialized blocks once, and the blocks are reclaimed with the
    // RDD when the result is dropped — a cache() entry would pin the
    // largest intermediate in executor memory for the application lifetime
    val pairs = a.crossJoin(b)
      .withColumn("dot", aggregate(zip_with(col("wa"), col("wb"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x))
      .select("a_id", "b_id", "dot").localCheckpoint(true)
    val wa2 = Window.partitionBy("a_id").orderBy(col("dot").desc, col("b_id"))
    val sa = pairs.withColumn("rk", row_number().over(wa2)).filter(col("rk") <= k)
      .groupBy("a_id").agg(sum("dot").as("s_a"))
    val wb2 = Window.partitionBy("b_id").orderBy(col("dot").desc, col("a_id"))
    val sb = pairs.withColumn("rk", row_number().over(wb2)).filter(col("rk") <= k)
      .groupBy("b_id").agg(sum("dot").as("s_b"))
    val bw = Window.partitionBy("a_id").orderBy(col("margin_scaled").desc, col("b_id"))
    pairs.join(sa, "a_id").join(sb, "b_id")
      .filter(col("s_a") + col("s_b") > 0 && col("dot") >= 0)
      .withColumn("margin_scaled",
        expr(s"(${2L * k}L * dot * 1000000L) DIV (s_a + s_b)"))
      .withColumn("rk", row_number().over(bw)).filter(col("rk") === 1)
      .filter(col("margin_scaled") >= minMarginScaled)
      .select(col("a_id"), col("b_id"), col("dot"), col("margin_scaled"))
  }
}
