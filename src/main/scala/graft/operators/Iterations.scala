package graft.operators

import org.apache.spark.sql.DataFrame

/** Batch iteration facade (reference: DataSet.iterate / iterateDelta —
  * flink-runtime/.../iterative/task/IterationHeadTask.java and the
  * solution-set delta iteration model): the reference runs loops inside
  * the cluster; Spark's equivalent is a driver loop of short jobs with
  * `localCheckpoint` per round to keep lineage flat (same asymptotics —
  * each round is one shuffle — minus the in-cluster loop scheduling).
  */
object Iterations {

  /** Bulk iteration: apply `step` `maxIter` times. `fuse` rounds compile
    * into one plan per localCheckpoint: each checkpoint is a full job with
    * fixed scheduling cost, so fusing halves (fuse=2) the job count while
    * keeping lineage bounded — the classic small-graph amortization; at
    * scale the per-round shuffles dominate and fusing is neutral. */
  def iterate(initial: DataFrame, maxIter: Int, fuse: Int = 1)(
      step: DataFrame => DataFrame): DataFrame = {
    var cur = initial
    var i = 0
    while (i < maxIter) {
      val k = math.min(fuse, maxIter - i)
      for (_ <- 1 to k) cur = step(cur)
      cur = cur.localCheckpoint()
      i += k
    }
    cur
  }

  /** Delta iteration: iterate until `converged(prev, next)` or maxIter.
    * `converged` typically counts changed rows (the solution-set delta);
    * it runs one small job per round, like the reference's convergence
    * criterion on the workset. */
  def iterateDelta(initial: DataFrame, maxIter: Int)(step: DataFrame => DataFrame)(
      converged: (DataFrame, DataFrame) => Boolean): DataFrame = {
    var cur = initial.localCheckpoint()
    var done = false
    var i = 0
    while (!done && i < maxIter) {
      val next = step(cur).localCheckpoint()
      done = converged(cur, next)
      cur.unpersist()
      cur = next
      i += 1
    }
    cur
  }
}
