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

    // Q9-adapted: product-type profit by nation and year (no partsupp table
    // in the fixture, so profit = discounted revenue) — the 5-way
    // star join + two-level agg shape
    Entry("q09_product_profit",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val p = t(s, dir, "part").filter(col("p_name").like("%widget%"))
        val o = t(s, dir, "orders")
        val sp = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        li.join(p, col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(sp, col("l_suppkey") === col("s_suppkey"))
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
          .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
            .as("profit"))
      },
      Some(s"""SELECT n_name AS nation, CAST(extract(year FROM o_orderdate) AS INT) AS o_year,
          (CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT)/10000.0) AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2""")),

    // Q11-adapted: important stock = supplier balances per nation exceeding
    // a fraction of the global total (no partsupp: s_acctbal as the value) —
    // scalar subquery inside HAVING
    Entry("q11_important_stock",
      (s, dir) => {
        val sp = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val byNation = sp.join(n, col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(sum(cents(col("s_acctbal"))).as("value_c"))
        val total = sp.agg(sum(cents(col("s_acctbal"))).as("total_c"))
        byNation.crossJoin(broadcast(total))
          .filter(col("value_c") * 25 > col("total_c"))
          .select(col("nation"), col("value_c"))
      },
      Some(s"""SELECT n_name AS nation,
          CAST(sum(${centsSql("s_acctbal")}) AS BIGINT) AS value_c
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        HAVING CAST(sum(${centsSql("s_acctbal")}) AS BIGINT) * 25 >
          (SELECT CAST(sum(${centsSql("s_acctbal")}) AS BIGINT) FROM supplier)""")),

    // Q12-adapted: priority classification per returnflag ("shipmode") for a
    // shipdate year — the CASE-sum pivot shape
    Entry("q12_shipmode_priority",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        val o = t(s, dir, "orders")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("o_orderpriority") === "1-URGENT" ||
              col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority") =!= "1-URGENT" &&
              col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L)).as("low_line_count"))
      },
      Some("""SELECT l_returnflag,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag""")),

    // Q13: customer order-count distribution (left outer join + double agg);
    // priority filter stands in for the missing o_comment predicate
    Entry("q13_cust_distribution",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
        GROUP BY c_count""")),

    // Q15: top supplier(s) by quarterly revenue — aggregate, take the max
    // via a scalar subquery, join back to supplier
    Entry("q15_top_supplier",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        // cached: the revenue view feeds BOTH the global max and the
        // equality filter (Q15's defining shape) — uncached, the lineitem
        // scan+aggregate runs twice; the view is supplier-cardinality,
        // tiny at any scale. Released by the harness's per-query
        // clearCache after the consuming action.
        val rev = li.groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
            .as("total_revenue_c"))
          .cache()
        val top = rev.agg(max(col("total_revenue_c")).as("m"))
        rev.crossJoin(broadcast(top)).filter(col("total_revenue_c") === col("m"))
          .join(t(s, dir, "supplier"), col("supplier_no") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue_c"))
      },
      Some(s"""WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
            CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT) AS total_revenue_c
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue_c
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue_c = (SELECT max(total_revenue_c) FROM revenue)""")),

    // Q16-adapted: distinct supplier counts per brand/type/size, excluding
    // suppliers flagged by a subquery (negative balance stands in for the
    // missing complaints comment) — NOT IN + COUNT DISTINCT shape
    Entry("q16_parts_supplier_cnt",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val p = t(s, dir, "part").filter(col("p_brand") =!= "Brand#13" && col("p_size") <= 20)
        val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
          .select(col("s_suppkey").as("bad_key"))
        li.join(p, col("l_partkey") === col("p_partkey"))
          .join(bad, col("l_suppkey") === col("bad_key"), "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some("""SELECT p_brand, p_type, p_size,
          count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#13' AND p_size <= 20
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size""")),

    // Q17: small-quantity-order revenue — correlated average-quantity
    // threshold per part (windowed avg instead of the correlated subquery:
    // one pass, no rescan; p_type filter stands in for brand+container)
    Entry("q17_small_qty_revenue",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val p = t(s, dir, "part").filter(col("p_type") === "SMALL")
        val joined = li.join(p, col("l_partkey") === col("p_partkey"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("p_partkey"))
        joined
          // all-integer threshold (cents): qty_c * n * 10 < sum_qty_c * 5,
          // i.e. qty < 0.5 * avg(qty) over the part, order-insensitive
          .withColumn("sum_q", sum(cents(col("l_quantity"))).over(w))
          .withColumn("n_q", count(lit(1)).over(w))
          .filter(cents(col("l_quantity")) * col("n_q") * 10 < col("sum_q") * 5)
          .agg((sum(cents(col("l_extendedprice"))) / 100.0 / 7.0).as("avg_yearly"))
      },
      Some(s"""SELECT ((CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT)/100.0)/7.0) AS avg_yearly
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'SMALL'
          AND ${centsSql("l_quantity")} * 10 *
              (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
            < (SELECT CAST(sum(${centsSql("l2.l_quantity")}) AS BIGINT) FROM lineitem l2
               WHERE l2.l_partkey = lineitem.l_partkey) * 5""")),

    // Q21-adapted: suppliers whose lineitems appear in multi-supplier orders
    // where ONLY they returned goods (EXISTS + NOT EXISTS against the same
    // table with different correlations — no receipt/commit dates in fixture)
    Entry("q21_waiting_suppliers",
      (s, dir) => {
        import org.apache.spark.sql.functions.{max => smax}
        val li = t(s, dir, "lineitem")
        val sp = t(s, dir, "supplier")
        val perOrder = li.groupBy(col("l_orderkey").as("ok"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(when(col("l_returnflag") === "R", col("l_suppkey"))).as("n_r_supp"))
        val rLines = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
        rLines.join(perOrder, "ok")
          .filter(col("n_supp") >= 2 && col("n_r_supp") === 1)
          .groupBy(col("sk"))
          .agg(count(lit(1)).as("numwait"))
          .join(sp, col("sk") === col("s_suppkey"))
          .select(col("s_name"), col("numwait"))
      },
      Some("""WITH per_order AS (
          SELECT l_orderkey AS ok, count(DISTINCT l_suppkey) AS n_supp,
            count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_r_supp
          FROM lineitem GROUP BY l_orderkey),
        r_lines AS (
          SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
          FROM lineitem WHERE l_returnflag = 'R')
        SELECT s_name, count(*) AS numwait
        FROM r_lines JOIN per_order USING (ok)
        JOIN supplier ON sk = s_suppkey
        WHERE n_supp >= 2 AND n_r_supp = 1
        GROUP BY s_name""")),

    // Q22: customers with above-average balance and no orders — scalar
    // subquery threshold + anti join; custkey mod 7 stands in for the
    // missing phone country code
    Entry("q22_sales_opportunity",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .withColumn("cntrycode", pmod(col("c_custkey"), lit(7)))
          .filter(col("cntrycode").isin(1L, 2L, 3L))
        val avgBal = c.filter(col("c_acctbal") > 0)
          .agg((sum(cents(col("c_acctbal"))) / count(lit(1))).as("avg_c"))
        // every fixture customer has orders, so "no orders at all" is empty;
        // "no URGENT orders" keeps the anti-join shape with live output
        val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")).distinct()
        c.crossJoin(broadcast(avgBal))
          .filter(cents(col("c_acctbal")) > col("avg_c"))
          .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("cntrycode"))
          .agg(count(lit(1)).as("numcust"), sum(cents(col("c_acctbal"))).as("totacctbal_c"))
      },
      Some(s"""WITH cc AS (
          SELECT c_custkey, c_acctbal, c_custkey % 7 AS cntrycode FROM customer
          WHERE c_custkey % 7 IN (1, 2, 3)),
        t AS (SELECT avg(CAST(${centsSql("c_acctbal")} AS DOUBLE)) AS avg_c
              FROM cc WHERE c_acctbal > 0)
        SELECT cntrycode, count(*) AS numcust,
          CAST(sum(${centsSql("c_acctbal")}) AS BIGINT) AS totacctbal_c
        FROM cc, t
        WHERE ${centsSql("c_acctbal")} > avg_c
          AND NOT EXISTS (SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        GROUP BY cntrycode""")),

    // Q2 shape (minimum-cost supplier): the fixture has no partsupp table,
    // so one is DERIVED deterministically — distinct (partkey, suppkey)
    // pairs observed in lineitem with a synthesized supplycost that is a
    // pure integer function of the keys (both engines replay it exactly).
    // The correlated min-per-part subquery becomes a window min over the
    // joined frame: ONE shuffle on p_partkey, with the supplier/nation/
    // region dimension chain broadcast — the Spark-first translation of
    // TPC-H Q2's correlated scalar subquery.
    Entry("qc5_min_cost_supplier",
      (s, dir) => {
        val ps = t(s, dir, "lineitem")
          .select(col("l_partkey").cast("long").as("ps_partkey"),
            col("l_suppkey").cast("long").as("ps_suppkey")).distinct()
          .withColumn("ps_supplycost",
            lit(100L) + (col("ps_partkey") * 37 + col("ps_suppkey") * 61) % 90000)
        val elig = ps
          .join(t(s, dir, "supplier"), col("s_suppkey") === col("ps_suppkey"))
          .join(t(s, dir, "nation"), col("n_nationkey") === col("s_nationkey"))
          .join(t(s, dir, "region").filter(col("r_name") === "EUROPE"),
            col("r_regionkey") === col("n_regionkey"))
        val j = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
          .join(elig, col("ps_partkey") === col("p_partkey"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("p_partkey")
        j.withColumn("mc", min(col("ps_supplycost")).over(w))
          .filter(col("ps_supplycost") === col("mc"))
          .select(col("p_partkey"), col("s_name"),
            col("ps_suppkey").as("s_suppkey"), col("n_name"),
            col("ps_supplycost").as("supplycost_cents"),
            cents(col("s_acctbal")).as("acctbal_cents"))
      },
      Some(s"""WITH ps AS (
          SELECT DISTINCT CAST(l_partkey AS BIGINT) AS ps_partkey,
            CAST(l_suppkey AS BIGINT) AS ps_suppkey FROM lineitem),
        ps2 AS (SELECT ps_partkey, ps_suppkey,
            100 + (ps_partkey * 37 + ps_suppkey * 61) % 90000 AS ps_supplycost
          FROM ps),
        elig AS (SELECT ps2.*, s_name, s_acctbal, n_name
          FROM ps2 JOIN supplier ON s_suppkey = ps_suppkey
          JOIN nation ON n_nationkey = s_nationkey
          JOIN region ON r_regionkey = n_regionkey
          WHERE r_name = 'EUROPE'),
        j AS (SELECT p_partkey, s_name, ps_suppkey, n_name, ps_supplycost, s_acctbal,
            min(ps_supplycost) OVER (PARTITION BY p_partkey) AS mc
          FROM part JOIN elig ON ps_partkey = p_partkey WHERE p_type = 'ECONOMY')
        SELECT p_partkey, s_name, ps_suppkey AS s_suppkey, n_name,
          CAST(ps_supplycost AS BIGINT) AS supplycost_cents,
          ${centsSql("s_acctbal")} AS acctbal_cents
        FROM j WHERE ps_supplycost = mc""")),

    // Q20 shape (excess-stock suppliers): derived partsupp again, now with
    // a synthesized availqty; a supplier qualifies when its available
    // stock of some 'small%' part exceeds half the quantity it shipped of
    // that part in 1996 — the correlated half-sum subquery becomes a
    // pre-aggregated (partkey, suppkey) frame joined back (integral
    // 2·availqty > sum form, no float half), then a semi join onto the
    // supplier dimension. Aggregate and join co-partition on the same
    // composite key; the dimension chain broadcasts.
    Entry("qc6_excess_stock_suppliers",
      (s, dir) => {
        val ps = t(s, dir, "lineitem")
          .select(col("l_partkey").cast("long").as("ps_partkey"),
            col("l_suppkey").cast("long").as("ps_suppkey")).distinct()
          .withColumn("ps_availqty",
            lit(1L) + (col("ps_partkey") * 13 + col("ps_suppkey") * 7) % 1000)
        val smallParts = t(s, dir, "part")
          .filter(col("p_name").startsWith("small")).select("p_partkey")
        val shipped = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity").cast("long")).as("sq"))
        val excess = ps
          .join(smallParts, col("p_partkey") === col("ps_partkey"))
          .join(shipped, col("l_partkey") === col("ps_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
          .filter(col("ps_availqty") * 2 > col("sq"))
          .select(col("ps_suppkey")).distinct()
        t(s, dir, "supplier")
          .join(t(s, dir, "nation"), col("n_nationkey") === col("s_nationkey"))
          .join(t(s, dir, "region").filter(col("r_name") === "EUROPE"),
            col("r_regionkey") === col("n_regionkey"))
          .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
      },
      Some("""WITH ps AS (
          SELECT DISTINCT CAST(l_partkey AS BIGINT) AS ps_partkey,
            CAST(l_suppkey AS BIGINT) AS ps_suppkey FROM lineitem),
        ps2 AS (SELECT ps_partkey, ps_suppkey,
            1 + (ps_partkey * 13 + ps_suppkey * 7) % 1000 AS ps_availqty
          FROM ps),
        shipped AS (SELECT l_partkey, l_suppkey,
            CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY 1, 2),
        excess AS (SELECT DISTINCT ps_suppkey
          FROM ps2 JOIN part ON p_partkey = ps_partkey
          JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          WHERE p_name LIKE 'small%' AND 2 * ps_availqty > sq)
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE s_suppkey IN (SELECT ps_suppkey FROM excess)
          AND r_name = 'EUROPE'""")),
  )
}
