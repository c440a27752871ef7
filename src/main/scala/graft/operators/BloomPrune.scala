package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: shrink the big side of a join BEFORE the
  * shuffle.
  *
  * A semi/inner join where the probe side is huge but the match rate is low
  * pays a full shuffle of rows that mostly match nothing. A Bloom filter
  * built over the build side's keys (distributed treeAggregate — the big
  * probe side never moves) is broadcast to the probe scan and filters
  * non-matching rows at map time; only survivors (matches + a bounded
  * false-positive fraction) enter the shuffle. The exact join that follows
  * removes the false positives, so the result is bit-identical to the
  * unpruned join — the bloom stage is pruning, not approximation.
  *
  * This is the manual form of what AQE's runtime filters do for selective
  * star joins; having it as an operator lets a pipeline apply it where the
  * planner can't see the selectivity (e.g. the build side is the output of
  * an arbitrary computation). At 100 TB: shuffle volume drops by the
  * non-match fraction — routinely 10-100× on dedup/lookup workloads — for
  * the price of one broadcast of `expectedItems * ~10 bits`.
  */
object BloomPrune {

  /** `left LEFT SEMI JOIN right ON left(key) = right(key)`, bloom-pruned.
    * `fpp` trades filter size vs wasted shuffle (false positives are
    * re-filtered by the exact join, never emitted). Integral and string
    * keys are supported; anything else fails loudly rather than silently
    * pruning everything (a Long-only probe would null-cast e.g. UUID keys
    * and drop every row before the "exact" join). Null keys never match —
    * semi-join equality semantics. */
  def semiJoin(left: DataFrame, right: DataFrame, key: String,
               expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    val bloom = right.stat.bloomFilter(key, expectedItems, fpp)
    val bc = left.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = left.schema(key).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
          .apply(col(key).cast("long"))
      case StringType =>
        udf((k: String) => k != null && bc.value.mightContainString(k))
          .apply(col(key))
      case dt => throw new IllegalArgumentException(
        s"bloom-prunable key must be integral or string, got ${dt.sql}")
    }
    // left_semi dedups the build side itself — a distinct() here would add
    // a whole extra shuffle for nothing
    left.filter(mightContain)
      .join(right.select(key), Seq(key), "left_semi")
  }
}
