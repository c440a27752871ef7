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
