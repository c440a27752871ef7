package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Physical distribution surface (reference: DataStream keyBy/rebalance/
  * shuffle/broadcast/global/partitionCustom — flink-streaming-java/.../
  * runtime/partitioner/ one class each; DataSet partitionByHash/partitionByRange/
  * rebalance — flink-runtime/.../shipping/OutputEmitter.java).
  *
  * Spark mapping, exposed as a thin facade so the capability is explicit:
  * keyBy = hash repartition on key columns; rebalance = round-robin
  * repartition(n); partitionByRange = repartitionByRange; global =
  * coalesce(1)/repartition(1); broadcast = join-side hint (not a stream
  * shape); forward/rescale = narrow dependencies, automatic within stages.
  */
object Partitioning {

  /** keyBy / partitionByHash: co-locate rows by key hash. */
  def byKey(df: DataFrame, n: Int, keys: Column*): DataFrame =
    df.repartition(n, keys: _*)

  /** rebalance: even round-robin redistribution. */
  def rebalance(df: DataFrame, n: Int): DataFrame = df.repartition(n)

  /** partitionByRange: contiguous sorted ranges (sampled bounds). */
  def byRange(df: DataFrame, n: Int, keys: Column*): DataFrame =
    df.repartitionByRange(n, keys: _*)

  /** global: everything to a single partition (parallelism-1 sink). */
  def global(df: DataFrame): DataFrame = df.coalesce(1)

  /** sortPartition: per-partition local sort (no shuffle). */
  def sortWithin(df: DataFrame, keys: Column*): DataFrame =
    df.sortWithinPartitions(keys: _*)
}
