package graft.queries

import graft.Tables
import graft.functions.Scalars
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scalar expression surface (SURVEY.md §2.9): comparison/logic, math,
  * string, temporal, conditional, cast — evaluated over fixture rows and
  * hash-checked against DuckDB evaluating the same ANSI expressions.
  * Transcendentals are rounded (9 dp) to absorb last-ulp libm differences.
  */
object ExprQueries {
  import QueryUtil._

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  def entries: Seq[Entry] = Seq(

    Entry("q60_expr_math",
      (s, dir) => {
        val li = t(s, dir, "lineitem").filter(col("l_orderkey") <= 100)
        li.select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25).as("e_abs"),
          (col("l_quantity") % 7).as("e_mod"),
          round(sqrt(col("l_quantity")), 9).as("e_sqrt"),
          round(log(col("l_quantity")), 9).as("e_ln"),
          round(log10(col("l_quantity")), 9).as("e_log10"),
          round(exp(col("l_discount")), 9).as("e_exp"),
          round(pow(col("l_quantity"), 2), 9).as("e_power"),
          ceil(col("l_extendedprice") / 1000).as("e_ceil"),
          floor(col("l_extendedprice") / 1000).as("e_floor"),
          round(sin(col("l_discount")), 9).as("e_sin"),
          round(cos(col("l_discount")), 9).as("e_cos"),
          round(tan(col("l_discount")), 9).as("e_tan"),
          round(lit(1.0) / tan(col("l_discount") + 0.01), 9).as("e_cot"),
          round(asin(col("l_discount") * 5), 9).as("e_asin"),
          round(acos(col("l_discount") * 5), 9).as("e_acos"),
          round(atan(col("l_quantity")), 9).as("e_atan"),
          round(degrees(col("l_discount")), 9).as("e_degrees"),
          round(radians(col("l_quantity")), 9).as("e_radians"),
          signum(col("l_quantity") - 25).cast("int").as("e_sign"),
          round(lit(Math.PI), 9).as("e_pi"),
          round(exp(lit(1.0)), 9).as("e_e"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
        abs(l_quantity - 25) AS e_abs,
        (l_quantity % 7) AS e_mod,
        round(sqrt(l_quantity), 9) AS e_sqrt,
        round(ln(l_quantity), 9) AS e_ln,
        round(log10(l_quantity), 9) AS e_log10,
        round(exp(l_discount), 9) AS e_exp,
        round(pow(l_quantity, 2), 9) AS e_power,
        CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS e_ceil,
        CAST(floor(l_extendedprice / 1000) AS BIGINT) AS e_floor,
        round(sin(l_discount), 9) AS e_sin,
        round(cos(l_discount), 9) AS e_cos,
        round(tan(l_discount), 9) AS e_tan,
        round(1.0 / tan(l_discount + 0.01), 9) AS e_cot,
        round(asin(l_discount * 5), 9) AS e_asin,
        round(acos(l_discount * 5), 9) AS e_acos,
        round(atan(l_quantity), 9) AS e_atan,
        round(degrees(l_discount), 9) AS e_degrees,
        round(radians(l_quantity), 9) AS e_radians,
        CAST(sign(l_quantity - 25) AS INT) AS e_sign,
        round(pi(), 9) AS e_pi,
        round(exp(1.0), 9) AS e_e
        FROM lineitem WHERE l_orderkey <= 100""")),

    Entry("q61_expr_string",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_custkey") <= 100)
        c.select(
          col("c_custkey"),
          upper(col("c_mktsegment")).as("e_upper"),
          lower(col("c_name")).as("e_lower"),
          length(col("c_name")).as("e_len"),
          concat(col("c_mktsegment"), lit("-"), col("c_name")).as("e_concat"),
          substring(col("c_name"), 2, 5).as("e_substr"),
          instr(col("c_name"), "0").as("e_position"),
          trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("e_trim"),
          ltrim(concat(lit("xx"), col("c_mktsegment")), "x").as("e_ltrim"),
          rtrim(concat(col("c_mktsegment"), lit("yy")), "y").as("e_rtrim"),
          col("c_name").like("%001%").as("e_like"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("e_re_replace"),
          replace(col("c_mktsegment"), lit("I"), lit("1")).as("e_replace"),
          lpad(col("c_mktsegment"), 12, "*").as("e_lpad"),
          rpad(col("c_mktsegment"), 12, "*").as("e_rpad"),
          reverse(col("c_mktsegment")).as("e_reverse"),
          Scalars.initcapAscii(lower(col("c_mktsegment"))).as("e_initcap"))
      },
      Some("""SELECT c_custkey,
        upper(c_mktsegment) AS e_upper,
        lower(c_name) AS e_lower,
        length(c_name) AS e_len,
        concat(c_mktsegment, '-', c_name) AS e_concat,
        substring(c_name, 2, 5) AS e_substr,
        strpos(c_name, '0') AS e_position,
        trim('  ' || c_mktsegment || '  ') AS e_trim,
        ltrim('xx' || c_mktsegment, 'x') AS e_ltrim,
        rtrim(c_mktsegment || 'yy', 'y') AS e_rtrim,
        (c_name LIKE '%001%') AS e_like,
        regexp_replace(c_name, '[0-9]+', '#', 'g') AS e_re_replace,
        replace(c_mktsegment, 'I', '1') AS e_replace,
        lpad(c_mktsegment, 12, '*') AS e_lpad,
        rpad(c_mktsegment, 12, '*') AS e_rpad,
        reverse(c_mktsegment) AS e_reverse,
        (upper(substring(lower(c_mktsegment), 1, 1)) || substring(lower(c_mktsegment), 2)) AS e_initcap
        FROM customer WHERE c_custkey <= 100""")),

    Entry("q62_expr_temporal",
      (s, dir) => {
        val o = t(s, dir, "orders").filter(col("o_orderkey") <= 200)
        o.select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("e_year"),
          month(col("o_orderdate")).as("e_month"),
          dayofmonth(col("o_orderdate")).as("e_day"),
          quarter(col("o_orderdate")).as("e_quarter"),
          hour(col("o_orderdate")).as("e_hour"),
          date_trunc("month", col("o_orderdate")).cast("date").as("e_trunc_month"),
          (col("o_orderdate") + expr("INTERVAL 3 DAYS")).cast("date").as("e_plus_days"),
          (col("o_orderdate") + expr("INTERVAL 2 MONTHS")).cast("date").as("e_plus_months"),
          last_day(col("o_orderdate")).as("e_last_day"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("e_epoch_us"),
          Scalars.overlaps(
            col("o_orderdate"), col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            lit("1997-01-01").cast("timestamp"), lit("1997-03-01").cast("timestamp")
          ).as("e_overlaps"))
      },
      Some("""SELECT o_orderkey,
        CAST(extract(year FROM o_orderdate) AS INT) AS e_year,
        CAST(extract(month FROM o_orderdate) AS INT) AS e_month,
        CAST(extract(day FROM o_orderdate) AS INT) AS e_day,
        CAST(extract(quarter FROM o_orderdate) AS INT) AS e_quarter,
        CAST(extract(hour FROM o_orderdate) AS INT) AS e_hour,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS e_trunc_month,
        CAST(o_orderdate + INTERVAL 3 DAY AS DATE) AS e_plus_days,
        CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS e_plus_months,
        last_day(CAST(o_orderdate AS DATE)) AS e_last_day,
        epoch_us(o_orderdate) AS e_epoch_us,
        (o_orderdate <= TIMESTAMP '1997-03-01'
          AND TIMESTAMP '1997-01-01' <= o_orderdate + INTERVAL 30 DAY) AS e_overlaps
        FROM orders WHERE o_orderkey <= 200""")),

    Entry("q63_expr_conditional",
      (s, dir) => {
        val o = t(s, dir, "orders").filter(col("o_orderkey") <= 300)
        o.select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "medium")
            .otherwise("small").as("e_case"),
          nullif(col("o_orderstatus"), lit("O")).as("e_nullif"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("e_coalesce"),
          col("o_totalprice").between(50000, 150000).as("e_between"),
          nullif(col("o_orderstatus"), lit("O")).isNull.as("e_isnull"),
          nullif(col("o_orderstatus"), lit("O")).isNotNull.as("e_isnotnull"),
          (col("o_orderstatus") === "F" || col("o_orderpriority") === "1-URGENT").as("e_or"),
          (col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT").as("e_and"),
          (!(col("o_orderstatus") === "F")).as("e_not"))
      },
      Some("""SELECT o_orderkey,
        CASE WHEN o_totalprice > 300000 THEN 'big'
             WHEN o_totalprice > 100000 THEN 'medium'
             ELSE 'small' END AS e_case,
        nullif(o_orderstatus, 'O') AS e_nullif,
        coalesce(nullif(o_orderstatus, 'O'), 'open') AS e_coalesce,
        (o_totalprice BETWEEN 50000 AND 150000) AS e_between,
        (nullif(o_orderstatus, 'O') IS NULL) AS e_isnull,
        (nullif(o_orderstatus, 'O') IS NOT NULL) AS e_isnotnull,
        (o_orderstatus = 'F' OR o_orderpriority = '1-URGENT') AS e_or,
        (o_orderstatus = 'F' AND o_orderpriority = '1-URGENT') AS e_and,
        (NOT (o_orderstatus = 'F')) AS e_not
        FROM orders WHERE o_orderkey <= 300""")),

    Entry("q64_expr_cast_array",
      (s, dir) => {
        val n = t(s, dir, "nation")
        n.select(
          col("n_nationkey"),
          col("n_nationkey").cast("string").as("e_int_to_str"),
          (col("n_nationkey").cast("double") / 2).as("e_int_to_double"),
          substring(col("n_name"), 1, 1).as("e_first_char"),
          // rendered as a string: a raw list column is unsortable in the
          // driver's pandas row-sort (TypeError: unhashable numpy.ndarray)
          concat_ws(",", array(col("n_nationkey"), col("n_regionkey"))).as("e_array"),
          element_at(array(col("n_nationkey"), col("n_regionkey")), 1).as("e_element_at"),
          size(array(col("n_nationkey"), col("n_regionkey"))).as("e_cardinality"),
          array_contains(array(lit(0), lit(1), lit(2)), col("n_regionkey")).as("e_contains"),
          map(lit("nk"), col("n_nationkey"), lit("rk"), col("n_regionkey")).getItem("rk").as("e_map_get"))
      },
      Some("""SELECT n_nationkey,
        CAST(n_nationkey AS VARCHAR) AS e_int_to_str,
        (CAST(n_nationkey AS DOUBLE) / 2) AS e_int_to_double,
        substring(n_name, 1, 1) AS e_first_char,
        array_to_string([n_nationkey, n_regionkey], ',') AS e_array,
        [n_nationkey, n_regionkey][1] AS e_element_at,
        len([n_nationkey, n_regionkey]) AS e_cardinality,
        list_contains([0, 1, 2], n_regionkey) AS e_contains,
        MAP(['nk','rk'], [n_nationkey, n_regionkey])['rk'][1] AS e_map_get
        FROM nation""")),

    // Spark-bonus surface used by the events fixture (props is a JSON object)
    Entry("q65_expr_json",
      (s, dir) => {
        val e = t(s, dir, "events").filter(col("event_id") <= 500)
        e.select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("e_json_k"))
      },
      Some("""SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS INT) AS e_json_k
        FROM events WHERE event_id <= 500""")),

    // SQL TIME mapping (SURVEY §1.2 SqlTimeTypeInfo): TIME is represented
    // as micros-of-day LongType (graft.functions.TimeOfDay); the oracle
    // computes the SAME values through DuckDB's native TIME type (cast,
    // TIME '00:00:00' anchor arithmetic, TIME-typed extract and parse) —
    // proving the representation is bit-equivalent to a real TIME column.
    Entry("qd7_time_of_day",
      (s, dir) => {
        import graft.functions.TimeOfDay
        val e = t(s, dir, "events").filter(col("event_id") <= 2000)
        val tod = TimeOfDay.microsOfDay(col("ts"))
        e.select(
          col("event_id"),
          tod.as("tod_us"),
          TimeOfDay.formatSeconds(col("ts")).as("tod_str"),
          TimeOfDay.hourOf(tod).as("tod_hour"),
          TimeOfDay.minuteOf(tod).as("tod_min"),
          TimeOfDay.secondOf(tod).as("tod_sec"),
          TimeOfDay.parseMicros(TimeOfDay.formatSeconds(col("ts"))).as("tod_reparsed_us"))
      },
      Some("""SELECT event_id,
          datediff('microseconds', TIME '00:00:00', CAST(ts AS TIME)) AS tod_us,
          strftime(ts, '%H:%M:%S') AS tod_str,
          CAST(extract(hour FROM CAST(ts AS TIME)) AS INT) AS tod_hour,
          CAST(extract(minute FROM CAST(ts AS TIME)) AS INT) AS tod_min,
          CAST(floor(extract(second FROM CAST(ts AS TIME))) AS INT) AS tod_sec,
          datediff('microseconds', TIME '00:00:00',
            CAST(strftime(ts, '%H:%M:%S') AS TIME)) AS tod_reparsed_us
        FROM events WHERE event_id <= 2000""")),
  )
}
