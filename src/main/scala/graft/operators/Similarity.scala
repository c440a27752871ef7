package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
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
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query row.
    * corpus: (idCol, vecCol); queries: (qidCol, vecCol). Self-pairs (same id)
    * are excluded. Ties broken by neighbor id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, qidCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cos", VectorFunctions.cosineSimilarity(col("cvec"), col("qvec")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }

  /** Sign-bit bucket id for random-hyperplane LSH (deterministic planes). */
  private def hyperplanes(dim: Int, nBits: Int, table: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(1234L + table)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  private def bucketExpr(vec: org.apache.spark.sql.Column, dim: Int, nBits: Int, table: Int) = {
    val planes = hyperplanes(dim, nBits, table)
    (0 until nBits).map { b =>
      val dotp = planes(b).zipWithIndex.map { case (wgt, i) =>
        element_at(vec, i + 1).cast("double") * lit(wgt)
      }.reduce(_ + _)
      when(dotp >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: query probes its bucket per table. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              qidCol: String, k: Int, dim: Int, nBits: Int = 12, nTables: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("qvec"))
    val cb = c.select(col("*"), explode(array((0 until nTables).map(t =>
      struct(lit(t).as("tbl"), bucketExpr(col("cvec"), dim, nBits, t).as("bkt"))): _*)).as("tb"))
      .select(col("nbr_id"), col("cvec"), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    val qb = q.select(col("*"), explode(array((0 until nTables).map(t =>
      struct(lit(t).as("tbl"), bucketExpr(col("qvec"), dim, nBits, t).as("bkt"))): _*)).as("tb"))
      .select(col("query_id"), col("qvec"), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    val cands = cb.join(broadcast(qb), Seq("tbl", "bkt"))
      .filter(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"), col("cvec"), col("qvec"))
      .dropDuplicates("query_id", "nbr_id")
      .withColumn("cos", VectorFunctions.cosineSimilarity(col("cvec"), col("qvec")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("nbr_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }

  /** IVF-style approximate top-k: corpus assigned to nearest of nCells
    * centroids (deterministic sample of corpus rows), queries probe the
    * nProbe nearest cells. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              qidCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cvec"))
    // deterministic "centroids": lowest-id corpus rows (cheap coarse quantizer;
    // a k-means refinement is a driver-side loop on the same plan shape)
    val cents = c.orderBy(col("nbr_id")).limit(nCells)
      .select(col("nbr_id").as("cell_id"), col("cvec").as("centroid"))
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
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("nbr_id"))
    assigned.join(broadcast(probes), Seq("cell_id"))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cos", VectorFunctions.cosineSimilarity(col("cvec"), col("qvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }
}
