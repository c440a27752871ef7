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

  /** zipWithIndex (reference: flink-java/.../utils/DataSetUtils.java —
    * zipWithIndex's two-phase counts-then-offsets plan): globally
    * CONTIGUOUS 0-based indices without a single-partition sort —
    * `monotonically_increasing_id` is non-contiguous and a global
    * `row_number` window funnels everything through one task. Spark's RDD
    * `zipWithIndex` runs the same two jobs (per-partition counts, then
    * offset-mapped scan). Indices follow the DataFrame's partition order —
    * sort first for a deterministic assignment. */
  def zipWithIndex(df: DataFrame, indexCol: String): DataFrame = {
    val schema = df.schema.add(indexCol, org.apache.spark.sql.types.LongType,
      nullable = false)
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** zipWithUniqueId (reference: DataSetUtils.zipWithUniqueId): unique but
    * non-contiguous ids in ONE pass (id = index-within-partition ×
    * #partitions + partitionId) — when contiguity isn't needed, skip
    * zipWithIndex's extra counting job. */
  def zipWithUniqueId(df: DataFrame, indexCol: String): DataFrame = {
    val schema = df.schema.add(indexCol, org.apache.spark.sql.types.LongType,
      nullable = false)
    val n = df.rdd.getNumPartitions.toLong
    val rdd = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      rows.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i.toLong * n + pid))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
