package graft.queries

import graft.Tables
import graft.operators.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph capability queries (SURVEY.md §2.12, Gelly analogue) over a
  * customer→supplier bipartite graph derived from orders ⋈ lineitem.
  * Supplier node ids are offset by 100000 to avoid key collision.
  *
  * PageRank/CC use exact integer semantics so DuckDB recursive-CTE oracles
  * reproduce them bit-for-bit (see GraphOps).
  */
object GraphQueries {

  /** Sparse deterministic edge set (44 edges @ sf0.01 → 31 components). */
  private def sparseEdges(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val l = Tables(s, dir, "lineitem")
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_quantity") === 1 && col("o_totalprice") < 20000)
      .select(col("o_custkey").as("src"), (lit(100000) + col("l_suppkey")).as("dst"))
      .distinct()
  }

  private val OEdges =
    """SELECT DISTINCT o_custkey AS src, 100000 + l_suppkey AS dst
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       WHERE l_quantity = 1 AND o_totalprice < 20000"""

  /** Dense edge set for degrees/neighborhood (48.5k edges @ sf0.01). */
  private def denseEdges(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val l = Tables(s, dir, "lineitem")
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), (lit(100000) + col("l_suppkey")).as("dst"))
      .distinct()
  }

  private val ODenseEdges =
    """SELECT DISTINCT o_custkey AS src, 100000 + l_suppkey AS dst
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey"""

  def entries: Seq[Entry] = Seq(

    Entry("qa0_graph_degrees",
      (s, dir) => GraphOps.degrees(denseEdges(s, dir)),
      Some(s"""WITH edges AS ($ODenseEdges),
        nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)
        SELECT n.node,
          COALESCE(i.c, 0) AS in_deg, COALESCE(o.c, 0) AS out_deg,
          COALESCE(i.c, 0) + COALESCE(o.c, 0) AS deg
        FROM nodes n
        LEFT JOIN (SELECT dst, count(*) AS c FROM edges GROUP BY dst) i ON i.dst = n.node
        LEFT JOIN (SELECT src, count(*) AS c FROM edges GROUP BY src) o ON o.src = n.node""")),

    Entry("qa1_graph_cc",
      (s, dir) => GraphOps.connectedComponents(sparseEdges(s, dir)),
      Some(s"""WITH RECURSIVE edges AS ($OEdges),
        uedges AS (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges),
        nodes AS (SELECT DISTINCT a AS node FROM uedges),
        reach(node, lbl) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT e.b, r.lbl FROM reach r JOIN uedges e ON e.a = r.node)
        SELECT node, min(lbl) AS component FROM reach GROUP BY node""")),

    Entry("qa2_graph_pagerank",
      (s, dir) => GraphOps.pageRankScaled(sparseEdges(s, dir), iters = 10),
      Some(s"""WITH RECURSIVE edges AS ($OEdges),
        nodes AS (SELECT DISTINCT src AS node FROM edges UNION SELECT DISTINCT dst FROM edges),
        outdeg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
        pr(iter, node, rank) AS (
          SELECT 0, node, CAST(1000000 AS BIGINT) FROM nodes
          UNION ALL
          SELECT p.iter + 1, p.node,
            CAST(150000 + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT)
          FROM pr p LEFT JOIN (
            SELECT e.dst AS node, p2.iter, sum(p2.rank // o.d) AS contrib
            FROM pr p2 JOIN edges e ON e.src = p2.node JOIN outdeg o ON o.node = p2.node
            GROUP BY e.dst, p2.iter) c ON c.node = p.node AND c.iter = p.iter
          WHERE p.iter < 10)
        SELECT node, rank FROM pr WHERE iter = 10""")),

    // reduceOnNeighbors(SUM): supplier account balance summed per customer,
    // exact cents for engine portability
    Entry("qa3_graph_neighbor_agg",
      (s, dir) => {
        val sup = Tables(s, dir, "supplier")
          .select((lit(100000) + col("s_suppkey")).as("node"),
            round(col("s_acctbal") * 100).cast("long").as("bal_cents"))
        GraphOps.sumOverOutNeighbors(denseEdges(s, dir), sup, "bal_cents")
      },
      Some(s"""WITH edges AS ($ODenseEdges)
        SELECT src AS node,
          CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_cents,
          count(*) AS n_nbrs
        FROM edges JOIN supplier ON s_suppkey = dst - 100000
        GROUP BY src""")),
  )
}
