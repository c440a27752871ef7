package graft.queries

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Additional TPC-H-shaped acceptance queries (Q4/Q6/Q14/Q18/Q19 adapted to
  * the fixture's reduced schemas) — deepens the batch relational proof the
  * reference anchors with its TPCHQuery3/TPCHQuery10 examples
  * (reference: flink-examples/flink-examples-batch/.../relational/).
  * Exact-cents arithmetic throughout (QueryUtil). */
object TpchExtraQueries {
  import QueryUtil._

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  def entries: Seq[Entry] = Seq(

    // Q4: order-priority checking — semi join (reference expresses EXISTS
    // via coGroup; Spark's left_semi is the direct form)
    Entry("q04_order_priority",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        val li = t(s, dir, "lineitem") // fixture has no commitdate: every lineitem qualifies
        o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
        FROM orders WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        GROUP BY o_orderpriority""")),

    // Q6: forecasting revenue change — pure scan+filter+agg; the predicate
    // set pushes fully into the parquet scan
    Entry("q06_forecast_revenue",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            cents(col("l_discount")).between(5, 7) && col("l_quantity") < 24)
          .agg((sum(cents(col("l_extendedprice")) * cents(col("l_discount"))) / 10000.0)
            .as("revenue")),
      Some(s"""SELECT (CAST(sum(${centsSql("l_extendedprice")} * ${centsSql("l_discount")}) AS BIGINT)/10000.0) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND ${centsSql("l_discount")} BETWEEN 5 AND 7 AND l_quantity < 24""")),

    // Q14: promotion effect — conditional aggregation over a join
    Entry("q14_promo_effect",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        val p = t(s, dir, "part")
        li.join(p, col("l_partkey") === col("p_partkey"))
          .agg(((sum(when(col("p_type").startsWith("PROMO"),
              cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
              .otherwise(lit(0L))) * 10000L) /
            sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))))
            .as("promo_revenue_bp"))
      },
      Some(s"""SELECT (sum(CASE WHEN p_type LIKE 'PROMO%'
            THEN ${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})
            ELSE 0 END) * 10000
          / sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})))
          AS promo_revenue_bp
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'""")),

    // Q18: large-volume customers — join against a grouped-HAVING subquery
    Entry("q18_large_volume",
      (s, dir) => {
        val big = t(s, dir, "lineitem")
          .groupBy("l_orderkey").agg(sum(cents(col("l_quantity"))).as("sum_q_c"))
          .filter(col("sum_q_c") > 250 * 100)
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        o.join(big, col("o_orderkey") === col("l_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), cents(col("o_totalprice")).as("total_c"),
            (col("sum_q_c") / 100.0).as("sum_qty"))
      },
      Some(s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
          ${centsSql("o_totalprice")} AS total_c, (CAST(bq.sum_q_c AS BIGINT)/100.0) AS sum_qty
        FROM orders
        JOIN (SELECT l_orderkey, sum(${centsSql("l_quantity")}) AS sum_q_c
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(${centsSql("l_quantity")}) > 25000) bq
          ON o_orderkey = bq.l_orderkey
        JOIN customer ON o_custkey = c_custkey""")),

    // Q7: volume shipping between two nations — 6-way join, conditional
    // nation pairing, per-year revenue
    Entry("q07_volume_shipping",
      (s, dir) => {
        val n1 = t(s, dir, "nation").select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        val n2 = t(s, dir, "nation").select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate").between(lit("1996-01-01").cast("timestamp"),
            lit("1997-12-31").cast("timestamp")))
        t(s, dir, "supplier").join(li, col("s_suppkey") === col("l_suppkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(n1, col("s_nationkey") === col("sk"))
          .join(n2, col("c_nationkey") === col("ck"))
          .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
            .as("revenue"))
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS INT) AS l_year,
          (CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT)/10000.0) AS revenue
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3""")),

    // Q8: market share of one supplier nation within a region for a part
    // type family — conditional share in basis points (exact integers)
    Entry("q08_market_share",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val vol = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
        t(s, dir, "part").filter(col("p_type").startsWith("ECONOM"))
          .join(li, col("p_partkey") === col("l_partkey"))
          .join(t(s, dir, "orders").filter(
            col("o_orderdate").between(lit("1996-01-01").cast("timestamp"),
              lit("1997-12-31").cast("timestamp"))),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation").select(col("n_nationkey").as("ck"),
            col("n_regionkey")), col("c_nationkey") === col("ck"))
          .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(t(s, dir, "nation").select(col("n_nationkey").as("sk"),
            col("n_name").as("supp_nation")), col("s_nationkey") === col("sk"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(((sum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0L))) * 10000L) /
            sum(vol)).as("share_bp"))
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
          (sum(CASE WHEN ns.n_name = 'NATION_3'
              THEN ${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")}) ELSE 0 END) * 10000
            / sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")}))) AS share_bp
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region ON nc.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE p_type LIKE 'ECONOM%' AND r_name = 'ASIA'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        GROUP BY 1""")),

    // Q19-adapted: discounted revenue over disjunctive brand/size/quantity
    // predicates (no container/shipmode columns in the fixture)
    Entry("q19_disjunctive_pred",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val p = t(s, dir, "part")
        li.join(p, col("l_partkey") === col("p_partkey") && (
            (col("p_brand") === "Brand#13" && col("l_quantity").between(1, 11) && col("p_size").between(1, 5)) ||
            (col("p_brand") === "Brand#20" && col("l_quantity").between(10, 20) && col("p_size").between(1, 10)) ||
            (col("p_brand") === "Brand#7" && col("l_quantity").between(20, 30) && col("p_size").between(1, 15))))
          .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
            .as("revenue"))
      },
      Some(s"""SELECT (CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT)/10000.0) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
          AND ((p_brand = 'Brand#13' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
            OR (p_brand = 'Brand#20' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
            OR (p_brand = 'Brand#7' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15))""")),
  )
}
