package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join by key salting.
  *
  * At 100 TB a handful of hot keys (the "null key", a viral document, a
  * mega-customer) concentrate a shuffle partition onto one task. AQE's
  * skew-join split handles sort-merge joins automatically; salting is the
  * explicit, always-available alternative and the only option when the
  * skewed side feeds an aggregation-with-join pipeline AQE can't split.
  *
  * Mechanics: fan the skewed (left) side into `buckets` sub-keys with a
  * deterministic content hash, replicate the small/right side once per
  * bucket, join on (key, bucket). Row multiplication is only on the right
  * side (`buckets`×), so choose buckets ≈ ceil(hot-key rows / target
  * partition rows).
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right` on `key`, left side salted into
    * `buckets` sub-partitions per key. Result == plain inner join. */
  def saltedInner(left: DataFrame, right: DataFrame, key: String,
                  buckets: Int): DataFrame = {
    require(buckets >= 1)
    // Deterministic salt from the whole left row (stable across retries —
    // a random salt would break task-retry idempotence). Exact-duplicate
    // rows of a hot key are a common skew pathology and would all hash to
    // one bucket, so a per-partition row index is mixed in: deterministic
    // for a given task-attempt input, but spreads duplicates round-robin.
    val salted = left
      .withColumn("_rid", monotonically_increasing_id())
      .withColumn("_salt",
        pmod(xxhash64(struct(left.columns.map(col) :+ col("_rid"): _*)), lit(buckets)))
      .drop("_rid")
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
