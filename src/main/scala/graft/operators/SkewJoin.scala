package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    * `buckets` sub-partitions per key. Result == plain inner join.
    *
    * The salt is a content hash of the whole row: a pure function of the
    * data, so a task retry recomputing a partition after an upstream shuffle
    * reassigns rows assigns every row the SAME salt it got the first time.
    * Position-based salts (`monotonically_increasing_id`, partition id,
    * round-robin) depend on partition layout and intra-partition order and
    * can change on retry, silently dropping/duplicating joined rows
    * (SPARK-23207-class indeterminate-stage hazard) — never use them here.
    *
    * Caveat: exact duplicate rows hash identically and share a bucket. For
    * inputs whose skew IS exact duplication, set `spreadDuplicates = true`:
    * a within-(key, hash) `row_number` — deterministic because ties are
    * byte-identical rows, so any tie order yields the same salt multiset —
    * fans duplicates round-robin, at the cost of one extra shuffle of the
    * left side. */
  def saltedInner(left: DataFrame, right: DataFrame, key: String,
                  buckets: Int, spreadDuplicates: Boolean = false): DataFrame = {
    require(buckets >= 1)
    val cols = left.columns.map(col)
    val contentHash = xxhash64(cols.toIndexedSeq: _*)
    val salted =
      if (spreadDuplicates) {
        val dupRank = row_number().over(
          Window.partitionBy(col(key), contentHash).orderBy(contentHash))
        left.withColumn("_salt",
          pmod(contentHash + dupRank, lit(buckets.toLong)))
      } else {
        left.withColumn("_salt", pmod(contentHash, lit(buckets.toLong)))
      }
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
