package graft.queries

import graft.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch relational operator coverage (SURVEY.md §2.2–2.4, 2.6–2.8).
  *
  * Each entry pairs a Spark-first implementation with an equivalent ANSI SQL
  * oracle for DuckDB. Money aggregates use exact integer cents
  * (QueryUtil.cents) so hashes match bit-for-bit across engines.
  */
object BatchQueries {
  import QueryUtil._

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // ---- typed rows for the coGroup entry ----
  final case class OrderRow(o_orderkey: Long, o_totalprice: Double)
  final case class LineRow(l_orderkey: Long, l_extendedprice: Double)
  final case class CoOut(o_orderkey: Long, o_total_cents: Long, li_count: Long, li_cents: Long)

  def entries: Seq[Entry] = Seq(

    // ---------- scan + group-agg (TPC-H Q1 shape; reference example:
    // flink-examples-batch .../relational/TPCHQuery3.java uses the same tables)
    Entry("q01_pricing_summary",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            (sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"),
            (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
            (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0).as("sum_disc_price"),
            (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) * (lit(100L) + cents(col("l_tax")))) / 1000000.0).as("sum_charge"),
            (sum(cents(col("l_quantity"))).cast("double") / count(lit(1)) / 100.0).as("avg_qty"),
            (sum(cents(col("l_extendedprice"))).cast("double") / count(lit(1)) / 100.0).as("avg_price"),
            (sum(cents(col("l_discount"))).cast("double") / count(lit(1)) / 100.0).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        (CAST(sum(${centsSql("l_quantity")}) AS BIGINT)/100.0) AS sum_qty,
        (CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT)/100.0) AS sum_base_price,
        (CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT)/10000.0) AS sum_disc_price,
        (CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")}) * (100 + ${centsSql("l_tax")})) AS BIGINT)/1000000.0) AS sum_charge,
        (CAST(CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS DOUBLE)/count(*)/100.0) AS avg_qty,
        (CAST(CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS DOUBLE)/count(*)/100.0) AS avg_price,
        (CAST(CAST(sum(${centsSql("l_discount")}) AS BIGINT) AS DOUBLE)/count(*)/100.0) AS avg_disc,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus""")),

    // ---------- 3-way join + agg + topN (TPC-H Q3, the reference's flagship
    // example). Dim side (filtered customer) broadcasts under AQE.
    Entry("q03_shipping_priority",
      (s, dir) => {
        val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0).as("revenue"))
          .select(col("l_orderkey"), col("revenue"),
            col("o_orderdate").cast("date").as("o_date"), col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey,
        (CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT)/10000.0) AS revenue,
        CAST(o_orderdate AS DATE) AS o_date, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ---------- 6-way join through region (TPC-H Q5 shape)
    Entry("q05_local_supplier_volume",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val cust = t(s, dir, "customer")
        val sup = t(s, dir, "supplier")
        val nat = t(s, dir, "nation")
        val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name,
        (CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT)/10000.0) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // ---------- returned-item report (TPC-H Q10 shape)
    Entry("q10_returned_items",
      (s, dir) => {
        val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val cust = t(s, dir, "customer")
        val nat = t(s, dir, "nation")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
        (CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT)/10000.0) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // ---------- outer joins ----------
    Entry("q20_join_left_outer",
      (s, dir) => {
        val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "AUTOMOBILE")
        val ord = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_urgent"),
            (coalesce(sum(cents(col("o_totalprice"))), lit(0L)) / 100.0).as("urgent_total"))
      },
      Some(s"""SELECT c_custkey, count(o_orderkey) AS n_urgent,
        (CAST(coalesce(sum(${centsSql("o_totalprice")}), 0) AS BIGINT)/100.0) AS urgent_total
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
        WHERE c_mktsegment = 'AUTOMOBILE' GROUP BY c_custkey""")),

    Entry("q21_join_full_outer",
      (s, dir) => {
        val cn = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
          .groupBy(col("c_nationkey").as("nationkey")).agg(count(lit(1)).as("rich_customers"))
        val sn = t(s, dir, "supplier").filter(col("s_acctbal") > 5000)
          .groupBy(col("s_nationkey").as("nationkey")).agg(count(lit(1)).as("rich_suppliers"))
        cn.join(sn, Seq("nationkey"), "full_outer")
          .select(col("nationkey"),
            coalesce(col("rich_customers"), lit(0L)).as("rich_customers"),
            coalesce(col("rich_suppliers"), lit(0L)).as("rich_suppliers"))
      },
      Some("""SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        coalesce(c.rich_customers, 0) AS rich_customers,
        coalesce(s.rich_suppliers, 0) AS rich_suppliers
        FROM (SELECT c_nationkey AS nationkey, count(*) AS rich_customers
              FROM customer WHERE c_acctbal > 9000 GROUP BY 1) c
        FULL JOIN (SELECT s_nationkey AS nationkey, count(*) AS rich_suppliers
              FROM supplier WHERE s_acctbal > 5000 GROUP BY 1) s
        USING (nationkey)""")),

    Entry("q22_join_semi",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
        cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 450000)""")),

    Entry("q23_join_anti",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val ord = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_mktsegment"))
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""")),

    Entry("q24_join_cross",
      (s, dir) => {
        val reg = t(s, dir, "region").select(col("r_name"))
        val st = t(s, dir, "orders").select(col("o_orderstatus")).distinct()
        reg.crossJoin(st)
      },
      Some("""SELECT r_name, o_orderstatus FROM region
        CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s""")),

    // theta-join: equi key + residual non-equi predicate
    Entry("q25_join_theta",
      (s, dir) => {
        val sup = t(s, dir, "supplier")
        val cust = t(s, dir, "customer")
        cust.join(broadcast(sup),
            col("c_nationkey") === col("s_nationkey") && col("c_acctbal") > col("s_acctbal"))
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("richer_customers"))
      },
      Some("""SELECT s_suppkey, count(*) AS richer_customers
        FROM customer JOIN supplier
          ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal
        GROUP BY s_suppkey""")),

    // coGroup (reference: DataSet.coGroup — flink-runtime CoGroupDriver.java):
    // typed KeyValueGroupedDataset.cogroup, emitting per-key combined rows.
    Entry("q26_cogroup",
      (s, dir) => {
        import s.implicits._
        val ord: Dataset[OrderRow] = t(s, dir, "orders")
          .filter(col("o_orderkey") % 100 < 5)
          .select(col("o_orderkey"), col("o_totalprice")).as[OrderRow]
        val li: Dataset[LineRow] = t(s, dir, "lineitem")
          .filter(col("l_orderkey") % 100 < 5)
          .select(col("l_orderkey"), col("l_extendedprice")).as[LineRow]
        ord.groupByKey(_.o_orderkey).cogroup(li.groupByKey(_.l_orderkey)) {
          (key, os, ls) =>
            val oList = os.toSeq
            if (oList.isEmpty) Iterator.empty
            else {
              var n = 0L; var c = 0L
              ls.foreach { l => n += 1; c += Math.round(l.l_extendedprice * 100) }
              oList.iterator.map(o =>
                CoOut(key, Math.round(o.o_totalprice * 100), n, c))
            }
        }.toDF()
      },
      Some(s"""SELECT o.o_orderkey, ${centsSql("o.o_totalprice")} AS o_total_cents,
        coalesce(l.cnt, 0) AS li_count, coalesce(l.cents, 0) AS li_cents
        FROM orders o LEFT JOIN
          (SELECT l_orderkey, count(*) AS cnt,
                  CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS cents
           FROM lineitem WHERE l_orderkey % 100 < 5 GROUP BY 1) l
          ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey % 100 < 5""")),

    // ---------- aggregations beyond sum ----------
    Entry("q30_agg_stats",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
            round(stddev_pop(col("l_quantity")), 6).as("sdp_qty"),
            round(var_samp(col("l_quantity")), 6).as("var_qty"),
            round(var_pop(col("l_quantity")), 6).as("varp_qty"),
            (min(cents(col("l_extendedprice"))) / 100.0).as("min_price"),
            (max(cents(col("l_extendedprice"))) / 100.0).as("max_price"),
            countDistinct(col("l_partkey")).as("n_parts"),
            count(lit(1)).as("n_rows"))
      },
      Some(s"""SELECT l_returnflag,
        round(stddev_samp(l_quantity), 6) AS sd_qty,
        round(stddev_pop(l_quantity), 6) AS sdp_qty,
        round(var_samp(l_quantity), 6) AS var_qty,
        round(var_pop(l_quantity), 6) AS varp_qty,
        (CAST(min(${centsSql("l_extendedprice")}) AS BIGINT)/100.0) AS min_price,
        (CAST(max(${centsSql("l_extendedprice")}) AS BIGINT)/100.0) AS max_price,
        count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag""")),

    Entry("q31_minby_maxby",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        cust.groupBy(col("c_nationkey"))
          .agg(
            max_by(col("c_custkey"), struct(col("c_acctbal"), col("c_custkey"))).as("richest_cust"),
            min_by(col("c_custkey"), struct(col("c_acctbal"), col("c_custkey"))).as("poorest_cust"),
            count(lit(1)).as("n"))
      },
      // oracle states the same semantics with deterministic tie-breaks
      Some("""SELECT c_nationkey,
        first(c_custkey ORDER BY c_acctbal DESC, c_custkey DESC) AS richest_cust,
        first(c_custkey ORDER BY c_acctbal ASC, c_custkey ASC) AS poorest_cust,
        count(*) AS n
        FROM customer GROUP BY c_nationkey""")),

    Entry("q32_cube",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.cube(col("l_returnflag"), col("l_linestatus"))
          .agg((sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"),
            count(lit(1)).as("n"), grouping_id().as("gid"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        (CAST(sum(${centsSql("l_quantity")}) AS BIGINT)/100.0) AS sum_qty,
        count(*) AS n, GROUPING(l_returnflag, l_linestatus) AS gid
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""")),

    Entry("q33_rollup",
      (s, dir) => {
        val ord = t(s, dir, "orders")
        ord.rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg((sum(cents(col("o_totalprice"))) / 100.0).as("total"),
            count(lit(1)).as("n"), grouping_id().as("gid"))
      },
      Some(s"""SELECT o_orderstatus, o_orderpriority,
        (CAST(sum(${centsSql("o_totalprice")}) AS BIGINT)/100.0) AS total,
        count(*) AS n, GROUPING(o_orderstatus, o_orderpriority) AS gid
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""")),

    Entry("q34_grouping_sets",
      (s, dir) => {
        Tables.registerAll(s, dir)
        // In Spark SQL the literal 100.0 is DECIMAL, so bigint/100.0 yields a
        // DECIMAL result the driver's pandas renders as "506627.000000" while
        // DuckDB's is a double "506627.0" — cast both sides to DOUBLE.
        s.sql(s"""SELECT l_returnflag, l_linestatus,
          CAST(CAST(sum(${centsSql("l_quantity")}) AS BIGINT)/100.0 AS DOUBLE) AS sum_qty,
          grouping_id() AS gid
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        CAST(CAST(sum(${centsSql("l_quantity")}) AS BIGINT)/100.0 AS DOUBLE) AS sum_qty,
        GROUPING(l_returnflag, l_linestatus) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")),

    Entry("q35_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_returnflag")).distinct(),
      Some("SELECT DISTINCT l_suppkey, l_returnflag FROM lineitem")),

    // ---------- sorts / limits / per-group top-n ----------
    Entry("q40_sort_limit_offset",
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .offset(5).limit(15),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 15 OFFSET 5""")),

    Entry("q41_topn_per_group",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        li.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("l_returnflag"), col("rn"), col("l_orderkey"),
            col("l_linenumber"), col("l_extendedprice"))
      },
      Some("""SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice
        FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
          FROM lineitem) WHERE rn <= 3""")),

    // batch OVER: running aggregate, ROWS frame (reference: streaming OVER
    // RowTimeBoundedRowsOver — here the batch window-function equivalent)
    Entry("q42_over_rows_running",
      (s, dir) => {
        val li = t(s, dir, "lineitem").filter(col("l_suppkey") <= 5)
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        li.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          (sum(cents(col("l_extendedprice"))).over(w) / 100.0).as("running_total"),
          count(lit(1)).over(w).as("running_n"))
      },
      Some(s"""SELECT l_suppkey, l_orderkey, l_linenumber,
        (CAST(sum(${centsSql("l_extendedprice")}) OVER w AS BIGINT)/100.0) AS running_total,
        count(*) OVER w AS running_n
        FROM lineitem WHERE l_suppkey <= 5
        WINDOW w AS (PARTITION BY l_suppkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")),

    // batch OVER: RANGE frame on a numeric key
    Entry("q43_over_range",
      (s, dir) => {
        val ord = t(s, dir, "orders").filter(col("o_custkey") <= 100)
          .withColumn("price_cents", cents(col("o_totalprice")))
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("price_cents"))
          .rangeBetween(-1000000L, 0L)
        ord.select(col("o_orderkey"), col("o_orderpriority"),
          count(lit(1)).over(w).as("peers_within_10k"),
          (sum(col("price_cents")).over(w) / 100.0).as("band_total"))
      },
      Some(s"""SELECT o_orderkey, o_orderpriority,
        count(*) OVER w AS peers_within_10k,
        (CAST(sum(price_cents) OVER w AS BIGINT)/100.0) AS band_total
        FROM (SELECT *, ${centsSql("o_totalprice")} AS price_cents
              FROM orders WHERE o_custkey <= 100)
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY price_cents
          RANGE BETWEEN 1000000 PRECEDING AND CURRENT ROW)""")),

    // analytic functions (Spark superset of 1.3's OVER-aggregates)
    Entry("q44_over_lag_rank",
      (s, dir) => {
        val ord = t(s, dir, "orders").filter(col("o_custkey") <= 50)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        ord.select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          rank().over(Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))).as("price_rank"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        lag(o_totalprice, 1) OVER w AS prev_price,
        lead(o_totalprice, 1) OVER w AS next_price,
        rank() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
        FROM orders WHERE o_custkey <= 50
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    // ---------- set operations ----------
    Entry("q50_union_all",
      (s, dir) => {
        val a = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"))
        val b = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("custkey"))
        a.union(b).groupBy(col("custkey")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT custkey, count(*) AS n FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P') u
        GROUP BY custkey""")),

    Entry("q51_union_distinct",
      (s, dir) => {
        val a = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_nationkey").as("nationkey"))
        val b = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        a.union(b).distinct()
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION SELECT s_nationkey AS nationkey FROM supplier""")),

    Entry("q52_intersect",
      (s, dir) => {
        val a = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"))
        val b = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey"))
        a.intersect(b)
      },
      Some("""SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'""")),

    Entry("q53_except",
      (s, dir) => {
        val a = t(s, dir, "customer").select(col("c_custkey").as("custkey"))
        val b = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
        a.except(b)
      },
      Some("""SELECT c_custkey AS custkey FROM customer
        EXCEPT SELECT o_custkey AS custkey FROM orders""")),

    Entry("q54_except_all",
      (s, dir) => {
        val a = t(s, dir, "orders").filter(col("o_custkey") <= 20)
          .select(col("o_custkey").as("custkey"))
        val b = t(s, dir, "orders")
          .filter(col("o_custkey") <= 20 && col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey"))
        a.exceptAll(b)
      },
      Some("""SELECT o_custkey AS custkey FROM orders WHERE o_custkey <= 20
        EXCEPT ALL
        SELECT o_custkey AS custkey FROM orders
        WHERE o_custkey <= 20 AND o_orderstatus = 'O'""")),

    Entry("q55_intersect_all",
      (s, dir) => {
        val a = t(s, dir, "lineitem").filter(col("l_suppkey") <= 3)
          .select(col("l_partkey").as("partkey"))
        val b = t(s, dir, "lineitem").filter(col("l_suppkey") >= 4 && col("l_suppkey") <= 6)
          .select(col("l_partkey").as("partkey"))
        a.intersectAll(b)
      },
      Some("""SELECT l_partkey AS partkey FROM lineitem WHERE l_suppkey <= 3
        INTERSECT ALL
        SELECT l_partkey AS partkey FROM lineitem WHERE l_suppkey BETWEEN 4 AND 6""")),
  )
}
