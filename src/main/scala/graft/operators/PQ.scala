package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for approximate nearest-neighbor search (Jégou,
  * Douze & Schmid, "Product quantization for nearest neighbor search",
  * TPAMI 2011), on the deterministic scaled-integer k-means
  * ([[ML.kMeansScaled]]) so every code and every ADC distance is
  * engine-replayable.
  *
  * The vector is split into `m` contiguous subspaces; each gets its own
  * k-cell codebook trained on the sliced corpus, and a vector's code is its
  * nearest cell per subspace (integer L2, ties to the lower cell id). A
  * query probe precomputes one m×k lookup table of integer subspace
  * distances; the asymmetric-distance (ADC) estimate of ||q − x||² is then
  * the sum of m table entries — the corpus is scanned as CODES (m small
  * ints per vector instead of the full float vector: 64 floats → 4 codes
  * is a 64× read reduction), which is what makes exhaustive re-ranking
  * affordable at corpus scale. For 100 TB the exhaustive ADC scan composes
  * with IVF cell pruning ([[Similarity.ivfTopK]]): prune to a few cells,
  * ADC-rank inside them; this module keeps the two concerns separate.
  */
object PQ {

  /** Trained PQ model: `centroids` = (m, cell_id, cvec) — m·k rows, the
    * broadcast-sized codebook; `codes` = (id, m, cell_id) — the quantized
    * corpus, m rows per vector. */
  case class PQModel(centroids: DataFrame, codes: DataFrame)

  /** Train per-subspace codebooks and encode the corpus. `dim` must split
    * evenly into `m` subspaces; `k` cells per codebook, `iters` Lloyd
    * rounds (seeded from the first k vectors by id — deterministic). */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int, m: Int,
          k: Int, iters: Int, scale: Long = 1000000L): PQModel = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val sub = dim / m
    val parts = (0 until m).map { mi =>
      val sliced = df.select(col(idCol),
        slice(col(vecCol), mi * sub + 1, sub).as(vecCol))
      val r = ML.kMeansScaled(sliced, idCol, vecCol, k, iters, scale)
      (r.assignments.select(col(idCol).as("id"), lit(mi).as("m"), col("cell_id")),
        r.centroids.select(lit(mi).as("m"), col("cell_id"), col("cvec")))
    }
    PQModel(parts.map(_._2).reduce(_ unionByName _),
      parts.map(_._1).reduce(_ unionByName _))
  }

  /** ADC top-k: for each probe vector, the `topK` corpus ids by asymmetric
    * PQ distance (sum over subspaces of probe-to-assigned-cell integer L2),
    * ties to the lower corpus id. Returns (q_id, rank, id, adc_dist).
    *
    * Plan shape: the probe LUT (probes × m·k rows) is built against the
    * broadcast codebook and itself broadcast into the code scan, so the
    * only corpus-sized work is one scan of the code frame and the map-side-
    * combined (q_id, id) distance sum; nothing corpus-sized is built per
    * probe. */
  def adcTopK(model: PQModel, probes: DataFrame, idCol: String, vecCol: String,
              dim: Int, m: Int, topK: Int, scale: Long = 1000000L): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val sub = dim / m
    val pq = (0 until m).map { mi =>
      probes.select(col(idCol).as("q_id"), lit(mi).as("m"),
        transform(slice(col(vecCol), mi * sub + 1, sub),
          x => floor(x.cast("double") * scale).cast("long")).as("pv"))
    }.reduce(_ unionByName _)
    val lut = pq.join(broadcast(model.centroids), Seq("m"))
      .select(col("q_id"), col("m"), col("cell_id"),
        aggregate(zip_with(col("pv"), col("cvec"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("pdist"))
    val adc = model.codes.join(broadcast(lut), Seq("m", "cell_id"))
      .groupBy(col("q_id"), col("id"))
      .agg(sum(col("pdist")).as("adc_dist"))
    val w = Window.partitionBy("q_id").orderBy(col("adc_dist").asc, col("id").asc)
    adc.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("id"), col("adc_dist"))
  }

  /** IVF + PQ composed ANN (the IVFADC search layout of Jégou et al. 2011
    * §IV, minus residual encoding — codes quantize the raw vectors, the
    * coarse quantizer only PRUNES): each probe ranks only the codes whose
    * vector fell in one of its `nProbe` nearest coarse cells. At corpus
    * scale this is the production shape: the coarse assignment partitions
    * the corpus once; a probe touches nProbe/nCells of the code frame
    * instead of all of it, and everything probe-sized (coarse centroids,
    * probe→cell routing, the ADC lookup table) is broadcast — the scan
    * side never shuffles. Ties break to the lower cell / corpus id, so
    * results are deterministic and engine-replayable.
    *
    * `coarse` is a full-dimension [[ML.kMeansScaled]] fit over the same
    * corpus; `model` a [[fit]] over the same corpus. Returns
    * (q_id, rank, id, adc_dist) — at most topK rows per probe, fewer when
    * the probed cells hold fewer candidates. */
  def ivfAdcTopK(coarse: ML.KMeansResult, model: PQModel, probes: DataFrame,
                 idCol: String, vecCol: String, dim: Int, m: Int, nProbe: Int,
                 topK: Int, scale: Long = 1000000L): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val sub = dim / m
    val qp = probes.select(col(idCol).as("q_id"),
      transform(col(vecCol), x => floor(x.cast("double") * scale).cast("long")).as("qv"))
    val pw = Window.partitionBy("q_id").orderBy(col("cdist").asc, col("cell_id"))
    val probeCells = qp.crossJoin(broadcast(coarse.centroids))
      .withColumn("cdist",
        aggregate(zip_with(col("qv"), col("cvec"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
      .withColumn("r", row_number().over(pw)).filter(col("r") <= nProbe)
      .select(col("q_id"), col("cell_id").as("ivf_cell"))
    val lut = qp.select(col("q_id"),
        posexplode(array((0 until m).map(mi =>
          slice(col("qv"), mi * sub + 1, sub)): _*)).as(Seq("m", "pv")))
      .join(broadcast(model.centroids), Seq("m"))
      .select(col("q_id"), col("m"), col("cell_id"),
        aggregate(zip_with(col("pv"), col("cvec"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("pdist"))
    val cellOf = coarse.assignments
      .select(col(idCol).as("id"), col("cell_id").as("ivf_cell"))
    val routed = probeCells.join(broadcast(lut), Seq("q_id"))
    val adc = model.codes.join(cellOf, Seq("id"))
      .join(broadcast(routed), Seq("ivf_cell", "m", "cell_id"))
      .groupBy(col("q_id"), col("id"))
      .agg(sum(col("pdist")).as("adc_dist"))
    val w = Window.partitionBy("q_id").orderBy(col("adc_dist").asc, col("id").asc)
    adc.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("id"), col("adc_dist"))
  }
}
