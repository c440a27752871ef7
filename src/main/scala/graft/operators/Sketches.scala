package graft.operators

import graft.functions.Fnv1a64Expr
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed sketches with DETERMINISTIC, engine-replayable arithmetic.
  *
  * Spark's own approx_count_distinct is an HLL++ whose merge order and
  * internal hash are not replayable by an external oracle; this module
  * trades its bias corrections for bit-reproducibility: FNV-1a hashes,
  * trailing-zero register ranks (PCSA-style — same geometric tail as the
  * classic leading-zero form), and an EXACT integer register sum
  * (Σ 2^(64−M[j]) in decimal(38,0), order-independent), so the estimate is
  * one double expression over exact integers — any engine computes the
  * identical value, and the correctness gate hash-compares it.
  */
object Sketches {

  /** Raw HyperLogLog distinct-count estimate per group.
    *
    * One aggregation tree: (group, bucket) → max rank (2^p registers max),
    * then group → exact integer register sum → the harmonic-mean estimate
    * alpha·m²·2⁶⁴ / Σ 2^(64−M[j]) (absent registers contribute 2⁶⁴). Raw
    * estimator only — no small-range (linear-counting) switch, because ln
    * is not bit-portable across engines; `zero_registers` is emitted so a
    * caller can apply any correction. Relative error ≈ 1.04/√m.
    *
    * Scale: the shuffled register frame is at most groups × 2^p rows of
    * three numeric columns — corpus-size-independent — and the map-side
    * partial max compacts each partition to the same bound before the
    * exchange. This is THE sketch shape: one pass, tiny state, mergeable. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val m = 1 << p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val restMask = (1L << (64 - p)) - 1
    val g = groupCols.map(col)
    val h = Fnv1a64Expr(col(valueCol).cast("string"))
    val bucket = h.bitwiseAND(lit(m - 1L)).as("_bucket")
    // unsigned top bits: (h >> p) & ((1 << (64-p)) - 1) == h >>> p
    val rest = shiftright(h, p).bitwiseAND(lit(restMask))
    // trailing-zero rank + 1; all-zero rest caps at (64-p)+1. The lowbit
    // isolate rest & -rest is an exact power of two <= 2^(63-p), so log2
    // is exact in both engines.
    val rank = when(rest === 0L, lit(64 - p + 1))
      .otherwise((log2((rest.bitwiseAND(-rest)).cast("double"))).cast("int") + 1)
    val registers = df
      .select((g :+ bucket :+ rank.as("_rank")): _*)
      .groupBy((g :+ col("_bucket")): _*)
      .agg(max(col("_rank")).as("_m"))
    val two64 = lit(new java.math.BigDecimal("18446744073709551616"))
    registers
      .groupBy(g: _*)
      .agg(
        sum(pow(lit(2.0), lit(64) - col("_m")).cast("decimal(38,0)")).as("_present"),
        count(lit(1)).as("_nreg"))
      .select((g :+
        round(lit(alpha * m.toDouble * m.toDouble) * lit(math.pow(2.0, 64)) /
          (col("_present") + (lit(m.toLong) - col("_nreg")).cast("decimal(38,0)") * two64)
            .cast("double"), 4).as("hll_estimate") :+
        (lit(m.toLong) - col("_nreg")).as("zero_registers")): _*)
  }
}
