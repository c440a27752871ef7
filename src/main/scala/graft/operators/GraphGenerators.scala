package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic graph generators (reference: flink-gelly
  * `org.apache.flink.graph.generator.{CompleteGraph,CycleGraph,EmptyGraph,
  * GridGraph,HypercubeGraph,PathGraph,RMatGraph,SingletonEdgeGraph,
  * StarGraph}` — the Gelly generator package). Spark-first: every generator
  * is a pure expression pipeline over `spark.range`, so edge sets
  * materialize scan-free, fully parallel, and identically on any cluster
  * size — a 10^9-vertex cycle is one range + two projections, no driver
  * loop, no RNG state.
  *
  * Undirected generators follow Gelly's convention of emitting BOTH
  * directions of each edge ((a,b) and (b,a)); `emptyGraph` returns only
  * vertices. Edges are (src, dst) BIGINT columns, matching GraphOps.
  *
  * [[rmat]] replaces the reference's JDKRandomGenerator with a
  * splittable arithmetic mix (edge index × golden-ratio constants, mod a
  * Mersenne prime) so the SAME edge list is reproducible from plain
  * integer arithmetic in any SQL engine — the driver's DuckDB oracle
  * replays it bit-for-bit. Skew comes from the standard RMat quadrant
  * probabilities (a=0.57, b=0.19, c=0.19, d=0.05), applied per bit level.
  */
object GraphGenerators {

  /** Every ordered pair (i, j), i != j — Gelly CompleteGraph. */
  def complete(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).toDF("src").crossJoin(spark.range(n).toDF("dst"))
      .filter(col("src") =!= col("dst"))

  /** i ↔ (i+1) mod n — Gelly CycleGraph (both directions). */
  def cycle(spark: SparkSession, n: Long): DataFrame = {
    val fwd = spark.range(n).select(col("id").as("src"),
      ((col("id") + 1) % n).as("dst"))
    fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** i ↔ i+1 for i < n-1 — Gelly PathGraph. */
  def path(spark: SparkSession, n: Long): DataFrame = {
    val fwd = spark.range(n - 1).select(col("id").as("src"),
      (col("id") + 1).as("dst"))
    fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Hub 0 ↔ each of 1..n-1 — Gelly StarGraph. */
  def star(spark: SparkSession, n: Long): DataFrame = {
    val out = spark.range(1, n).select(lit(0L).as("src"), col("id").as("dst"))
    out.unionAll(out.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** rows × cols lattice, node id = r*cols + c, right/down neighbours —
    * Gelly GridGraph (both directions). */
  def grid(spark: SparkSession, rows: Long, cols: Long): DataFrame = {
    val cells = spark.range(rows * cols)
      .select(col("id"), (col("id") / cols).cast("long").as("r"),
        (col("id") % cols).as("c"))
    val right = cells.filter(col("c") < cols - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val down = cells.filter(col("r") < rows - 1)
      .select(col("id").as("src"), (col("id") + cols).as("dst"))
    val fwd = right.unionAll(down)
    fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** d-dimensional hypercube: x ↔ x XOR 2^b for each bit b — Gelly
    * HypercubeGraph. One explode over the bit positions; 2^d * d edges. */
  def hypercube(spark: SparkSession, d: Int): DataFrame = {
    require(d >= 1 && d < 62, s"hypercube dimension out of range: $d")
    spark.range(1L << d)
      .select(col("id").as("src"),
        explode(array((0 until d).map(b => lit(1L << b)): _*)).as("bit"))
      .select(col("src"), expr("src ^ bit").as("dst"))
  }

  /** Disjoint pairs 2i ↔ 2i+1 — Gelly SingletonEdgeGraph (k pairs). */
  def singletonEdges(spark: SparkSession, k: Long): DataFrame = {
    val fwd = spark.range(k).select((col("id") * 2).as("src"),
      (col("id") * 2 + 1).as("dst"))
    fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** n isolated vertices, no edges — Gelly EmptyGraph. */
  def empty(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).toDF("node")

  /** RMat power-law generator: 2^levels vertices, m edges. Each edge
    * descends `levels` quadrant choices; the choice at (edge e, level l)
    * is `mix(e, l, seed) mod 10000` against the cumulative a/b/c/d
    * thresholds (5700/7600/9500/10000). The mix is plain 63-bit-safe
    * integer arithmetic (products < 2^52), so an external SQL engine
    * reproduces the edge list exactly — see the qcc gate oracle. */
  def rmat(spark: SparkSession, levels: Int, m: Long, seed: Long = 7L): DataFrame = {
    require(levels >= 1 && levels <= 20, s"rmat levels out of range: $levels")
    // (level, bit weight) pairs precomputed as literals: level l owns bit
    // 2^(levels-1-l), most significant first
    val lvls = array((0 until levels).map(l =>
      struct(lit(l.toLong).as("l"), lit(1L << (levels - 1 - l)).as("w"))): _*)
    spark.range(m).select(col("id").as("e"), explode(lvls).as("x"))
      .select(col("e"), col("x.w").as("w"),
        (((col("e") + 1) * lit(2654435761L) + (col("x.l") + 1) * lit(40503L)
          + lit(seed)) % lit(2147483647L) % 10000).as("h"))
      .select(col("e"), col("w"),
        when(col("h") < 5700, array(lit(0L), lit(0L)))       // a: top-left
          .when(col("h") < 7600, array(lit(0L), lit(1L)))    // b: top-right
          .when(col("h") < 9500, array(lit(1L), lit(0L)))    // c: bottom-left
          .otherwise(array(lit(1L), lit(1L))).as("q"))       // d
      .groupBy(col("e"))
      .agg(sum(col("q")(0) * col("w")).as("src"),
        sum(col("q")(1) * col("w")).as("dst"))
      .select(col("src"), col("dst"))
  }
}
