package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic vertex-parallel iteration facades (reference: flink-gelly
  * `pregel/VertexCentricIteration.java`, `spargel/ScatterGatherIteration
  * .java`, `gsa/GatherSumApplyIteration.java` — Gelly's three iteration
  * models, all reachable via `Graph.run(...)`).
  *
  * Spark-first collapse: the reference executes user compute() functions
  * record-at-a-time inside an in-cluster loop; the columnar equivalent of
  * one superstep is a single message JOIN + per-vertex AGGREGATE + apply
  * PROJECTION — one shuffle keyed on the vertex id, whole-stage
  * codegen'd, no driver collect. The three models differ only in where
  * user logic attaches:
  *
  *  - scatter-gather: `scatter` maps the source vertex value to one
  *    message per out-edge; `gather` is a declarative aggregate over the
  *    inbox; `apply` combines old value and gathered value.
  *  - gather-sum-apply: `gather` also reads the edge value (the GSA
  *    neighborhood triple), `sum` reduces, `apply` as above.
  *  - vertex-centric (Pregel): compute() reads the WHOLE inbox — the
  *    columnar form passes the inbox as an array column (sorted for
  *    determinism), preserving arbitrary per-vertex logic.
  *
  * All three share one loop body under [[Iterations.withLoopProfile]] /
  * [[Iterations.maybeBroadcast]] (AQE off + sized shuffles below 1M
  * iterated rows; per-round broadcast of the vertex frame, which carries
  * no stats once checkpointed). Scale audit: per superstep exactly one
  * aggregate shuffle keyed on node id (plus the broadcast-or-shuffled
  * vertex join); state is the (node, val) frame — identical asymptotics
  * to the library algorithms (GraphOps.connectedComponents/pageRank)
  * that hand-inline this loop.
  *
  * Conventions: `edges` = (src, dst [, eval]) directed; messages flow
  * src → dst (pre-apply [[GraphOps.undirected]]'s both-direction view for
  * undirected semantics). `initial` = (node, val). Vertices with an empty
  * inbox keep their value (`apply` receives NULL for the gathered value).
  */
object GraphIterations {

  /** Scatter-gather superstep loop, fixed `maxIter` rounds (reference:
    * spargel/ScatterGatherIteration.java). */
  def scatterGather(edges: DataFrame, initial: DataFrame, maxIter: Int)(
      scatter: Column => Column, gather: Column => Column,
      apply: (Column, Column) => Column): DataFrame =
    loop(edges, initial, maxIter, convergeDelta = false)(
      srcVal => scatter(srcVal), gather, apply)

  /** Scatter-gather iterated to fixpoint: stops when no vertex value
    * changes between rounds (the reference's default convergence — a
    * vertex halts when it receives no value-changing message). */
  def scatterGatherToFixpoint(edges: DataFrame, initial: DataFrame, maxIter: Int)(
      scatter: Column => Column, gather: Column => Column,
      apply: (Column, Column) => Column): DataFrame =
    loop(edges, initial, maxIter, convergeDelta = true)(
      srcVal => scatter(srcVal), gather, apply)

  /** Gather-sum-apply (reference: gsa/GatherSumApplyIteration.java):
    * `gatherEdge` reads (source vertex value, edge value) — the GSA
    * Neighbor triple — `sum` reduces the per-vertex multiset, `apply`
    * merges into the old value. `edges` must carry an `eval` column. */
  def gatherSumApply(edges: DataFrame, initial: DataFrame, maxIter: Int)(
      gatherEdge: (Column, Column) => Column, sum: Column => Column,
      apply: (Column, Column) => Column): DataFrame = {
    require(edges.columns.contains("eval"), "gatherSumApply needs an eval edge column")
    loop(edges, initial, maxIter, convergeDelta = false)(
      srcVal => gatherEdge(srcVal, col("eval")), sum, apply)
  }

  /** Vertex-centric / Pregel (reference: pregel/VertexCentricIteration
    * .java): `compute` sees (old value, inbox array — message values from
    * all in-neighbors, ascending-sorted so the computation is
    * deterministic, NULL when the inbox is empty). Scale note: the
    * collect_list inbox does NOT combine map-side and grows with
    * in-degree — on skewed graphs prefer [[scatterGather]] /
    * [[gatherSumApply]], whose declarative aggregates partial-reduce
    * before the shuffle. */
  def vertexCentric(edges: DataFrame, initial: DataFrame, maxIter: Int)(
      message: Column => Column, compute: (Column, Column) => Column): DataFrame =
    loop(edges, initial, maxIter, convergeDelta = false)(
      srcVal => message(srcVal), inbox => sort_array(collect_list(inbox)), compute)

  private def loop(edges: DataFrame, initial: DataFrame, maxIter: Int,
                   convergeDelta: Boolean)(
      msg: Column => Column, gather: Column => Column,
      apply: (Column, Column) => Column): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.cache()
    val eRows = e.count()
    val maybeB = Iterations.maybeBroadcast(eRows)
    val result = Iterations.withLoopProfile(spark, eRows) {
      val step: DataFrame => DataFrame = { cur =>
        val inbox = e.join(maybeB(cur), e("src") === cur("node"))
          .select(e("dst").as("node"), msg(cur("val")).as("m"))
          .groupBy(col("node")).agg(gather(col("m")).as("acc"))
        cur.join(maybeB(inbox), Seq("node"), "left")
          .select(col("node"), apply(col("val"), col("acc")).as("val"))
      }
      if (convergeDelta)
        Iterations.iterateDelta(initial, maxIter)(step) { (prev, next) =>
          next.alias("n").join(prev.alias("p"), Seq("node"))
            .filter(col("n.val") =!= col("p.val")).isEmpty
        }
      else Iterations.iterate(initial, maxIter)(step)
    }
    e.unpersist()
    result
  }
}
