package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType/DoubleType)` columns, built from
  * codegen-friendly higher-order functions (no UDFs, no serialization).
  *
  * Capability parity: the reference ships distance metrics as FlinkML
  * classes (reference: flink-libraries/flink-ml/.../ml/metrics/distances/
  * {Euclidean,SquaredEuclidean,Cosine,Chebyshev,Manhattan,Minkowski,
  * Tanimoto}DistanceMetric.scala); here each is a `Column` expression so
  * Catalyst can fuse it into scans/joins and whole-stage codegen.
  *
  * Accumulation is a strict left-to-right fold in element order (`aggregate`),
  * which makes results deterministic and engine-portable.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("double")

  /** Elementwise-product sum; accumulates in double regardless of input width. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  def normL2(a: Column): Column = sqrt(dot(a, a))

  def normL1(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + abs(d(v)))

  def euclidean(a: Column, b: Column): Column =
    sqrt(squaredEuclidean(a, b))

  def squaredEuclidean(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (acc, v) => acc + v)

  def manhattan(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(d(x) - d(y))), lit(0.0), (acc, v) => acc + v)

  def chebyshev(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(d(x) - d(y))), lit(0.0),
      (acc, v) => greatest(acc, v))

  def minkowski(a: Column, b: Column, p: Double): Column =
    pow(aggregate(zip_with(a, b, (x, y) => pow(abs(d(x) - d(y)), lit(p))),
      lit(0.0), (acc, v) => acc + v), lit(1.0 / p))

  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (normL2(a) * normL2(b))

  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** Tanimoto similarity: dot / (|a|^2 + |b|^2 - dot). */
  def tanimoto(a: Column, b: Column): Column = {
    val ab = dot(a, b)
    ab / (dot(a, a) + dot(b, b) - ab)
  }
}
