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
    // Deterministic salt (stable across retries — a random salt would break
    // task-retry idempotence): the per-partition row index modulo buckets is
    // EXACT round-robin, so a hot key's rows — including exact duplicates, a
    // common skew pathology a content hash would pile into one bucket —
    // spread evenly by construction, with no per-row hashing cost.
    val salted = left
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
