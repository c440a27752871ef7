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
                  p: Int = 10): DataFrame = hllEstimate(
    hllRegisters(df, groupCols, valueCol, p), groupCols, p)

  /** The HLL register frame: (group, _bucket, _m) with at most 2^p rows per
    * group. Exposed separately from the estimate because registers MERGE —
    * union two frames and re-max to sketch a set union without touching the
    * raw data again (the property that makes sketches the right shape at
    * corpus scale: per-source/per-day register frames are tiny, mergeable
    * roll-ups). */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val g = groupCols.map(col)
    df.select((g :+ hllBucket(col(valueCol), p).as("_bucket")
        :+ hllRank(col(valueCol), p).as("_rank")): _*)
      .groupBy((g :+ col("_bucket")): _*)
      .agg(max(col("_rank")).as("_m"))
  }

  /** The raw-HLL estimate over a register frame (from [[hllRegisters]], or a
    * union of several re-maxed by the caller). */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val g = groupCols.map(col)
    val two64 = lit(new java.math.BigDecimal("18446744073709551616"))
    registers
      .groupBy(g: _*)
      .agg(
        sum(pow(lit(2.0), lit(64) - col("_m")).cast("decimal(38,0)")).as("_present"),
        count(lit(1)).as("_nreg"))
      .select((g :+
        round(lit(alphaFor(p) * m.toDouble * m.toDouble) * lit(math.pow(2.0, 64)) /
          (col("_present") + (lit(m.toLong) - col("_nreg")).cast("decimal(38,0)") * two64)
            .cast("double"), 4).as("hll_estimate") :+
        (lit(m.toLong) - col("_nreg")).as("zero_registers")): _*)
  }

  /** Streaming windowed HLL: distinct-count estimate per event-time tumbling
    * window — the canonical "distinct users per window" job, as a sketch.
    * Two chained windowed aggregations (Spark's multiple-stateful-operator
    * form): window×bucket max-rank registers, then the register sum re-keyed
    * on the same window via window_time. State per window is 2^p registers
    * no matter how many events arrive — the unbounded-key danger of exact
    * windowed countDistinct is gone by construction. Works identically on a
    * batch frame (the window functions degrade to ordinary groupBys).
    * Append-mode: a window emits once its end passes the watermark. */
  def hllWindowedDistinct(events: DataFrame, tsCol: String, duration: String,
                          valueCol: String, p: Int, watermark: String): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val m = 1 << p
    val regs = events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), hllBucket(col(valueCol), p).as("_bucket"),
        hllRank(col(valueCol), p).as("_rank"))
      .groupBy(window(col(tsCol), duration), col("_bucket"))
      .agg(max(col("_rank")).as("_m"))
    val two64 = lit(new java.math.BigDecimal("18446744073709551616"))
    regs
      .groupBy(window(window_time(col("window")), duration).as("window"))
      .agg(
        sum(pow(lit(2.0), lit(64) - col("_m")).cast("decimal(38,0)")).as("_present"),
        count(lit(1)).as("_nreg"))
      .select(col("window"),
        round(lit(alphaFor(p) * m.toDouble * m.toDouble) * lit(math.pow(2.0, 64)) /
          (col("_present") + (lit(m.toLong) - col("_nreg")).cast("decimal(38,0)") * two64)
            .cast("double"), 4).as("hll_estimate"),
        (lit(m.toLong) - col("_nreg")).as("zero_registers"))
  }

  /** Merge register frames (set UNION of the underlying sets): union the
    * rows, re-max per (group, bucket). Lossless — merge(sketch(A), sketch(B))
    * equals sketch(A ∪ B) register-for-register, so union cardinalities
    * across sources/partitions/days cost only sketch-sized frames. */
  def hllMerge(regs: Seq[DataFrame], groupCols: Seq[String]): DataFrame =
    regs.reduce(_ unionByName _)
      .groupBy((groupCols.map(col) :+ col("_bucket")): _*)
      .agg(max(col("_m")).as("_m"))

  /** Count-Min frequency sketch over a key column (Cormode & Muthukrishnan,
    * "An improved data stream summary: the count-min sketch", J.Alg 2005).
    *
    * d seeded FNV rows × w buckets (w a power of two so the bucket is a
    * signed-safe low-bit mask, identical in any engine). One explode +
    * one count aggregation: the shuffled frame is at most d·w counter rows
    * — corpus-size-independent — with map-side partial counts compacting
    * each partition to that bound first. Counters are plain sums, so
    * sketches merge by adding (streams, shards, days) and the classic
    * guarantee holds: estimate ≥ true, over by ≤ 2N/w with prob 1−2⁻ᵈ.
    *
    * Returns (cm_row, cm_bucket, cm_cnt). */
  def countMin(df: DataFrame, keyCol: String, w: Int, d: Int): DataFrame =
    df.select(posexplode(seededBuckets(col(keyCol), w, d)).as(Seq("cm_row", "cm_bucket")))
      .groupBy(col("cm_row"), col("cm_bucket"))
      .agg(count(lit(1)).as("cm_cnt"))

  /** Point-query a [[countMin]] sketch: min over the d seeded counters.
    * The sketch side is ≤ d·w rows and is broadcast, so probing N keys is
    * one broadcast join + one d-row min per key — probes never shuffle the
    * corpus. (w, d) are the sketch identity and must match the build. */
  def cmLookup(sketch: DataFrame, probes: DataFrame, keyCol: String,
               w: Int, d: Int): DataFrame =
    probes
      .select(col(keyCol), posexplode(seededBuckets(col(keyCol), w, d))
        .as(Seq("cm_row", "cm_bucket")))
      .join(broadcast(sketch), Seq("cm_row", "cm_bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cm_cnt"), lit(0L))).as("cm_est"))

  /** Register index: low p bits of the FNV hash. */
  private def hllBucket(value: org.apache.spark.sql.Column, p: Int) =
    Fnv1a64Expr(value.cast("string")).bitwiseAND(lit((1L << p) - 1))

  /** Trailing-zero rank + 1 of the remaining 64−p hash bits; an all-zero
    * rest caps at (64−p)+1. The lowbit isolate rest & -rest is an exact
    * power of two <= 2^(63−p), so log2 on it is exact in any engine. */
  private def hllRank(value: org.apache.spark.sql.Column, p: Int) = {
    val h = Fnv1a64Expr(value.cast("string"))
    // unsigned top bits: (h >> p) & ((1 << (64-p)) - 1) == h >>> p
    val rest = shiftright(h, p).bitwiseAND(lit((1L << (64 - p)) - 1))
    when(rest === 0L, lit(64 - p + 1))
      .otherwise(log2(rest.bitwiseAND(-rest).cast("double")).cast("int") + 1)
  }

  /** The standard HLL bias constant for register count m = 2^p. */
  private def alphaFor(p: Int): Double = p match {
    case 4 => 0.673
    case 5 => 0.697
    case 6 => 0.709
    case _ => { val m = 1 << p; 0.7213 / (1.0 + 1.079 / m) }
  }

  /** The d per-row buckets of a key: FNV-1a over "i|key" masked to the low
    * log2(w) bits. Seeding by string prefix keeps the d hashes independent
    * while staying one primitive any engine can replay. */
  private def seededBuckets(key: org.apache.spark.sql.Column, w: Int, d: Int) = {
    require(w >= 2 && (w & (w - 1)) == 0, s"w must be a power of two, got $w")
    require(d >= 1 && d <= 8, s"d must be in [1, 8], got $d")
    array((0 until d).map { i =>
      Fnv1a64Expr(concat(lit(s"$i|"), key.cast("string")))
        .bitwiseAND(lit((w - 1).toLong))
    }: _*)
  }
}
