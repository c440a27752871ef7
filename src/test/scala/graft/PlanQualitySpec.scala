package graft

import graft.queries.Registry

/** Pins the plan properties that matter at 100 TB: predicate pushdown and
  * column pruning must reach the parquet scan, dimension joins must
  * broadcast at small scale, and a plain group-by must be one shuffle with
  * map-side partial aggregation inside whole-stage codegen. A regression in
  * any of these is invisible to result-correctness checks but catastrophic
  * at scale. */
class PlanQualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = Registry.queries(name)(spark, sf)
    df.collect() // force AQE to finalize adaptive plans
    df.queryExecution.executedPlan.toString
  }

  test("q06 scan carries pushed filters and a pruned read schema") {
    val plan = executedPlan("q06_forecast_revenue")
    assert(plan.contains("PushedFilters: ["), s"no pushed filters:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]].*"),
      s"pushed filter list is empty:\n$plan")
    // projection needs only 4 of lineitem's 11 columns
    val read = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(read.contains("l_shipdate") && read.contains("l_quantity") &&
      !read.contains("l_orderkey"), s"read schema not pruned: $read")
  }

  test("q03 dimension join broadcasts at small scale") {
    val plan = executedPlan("q03_shipping_priority")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"dimension join did not broadcast:\n$plan")
  }

  test("q01 aggregation is one shuffle with map-side partial agg in codegen") {
    val plan = executedPlan("q01_pricing_summary")
    val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 exchanges (agg + result sort), got $exchanges:\n$plan")
    assert(plan.contains("partial_sum"), s"no map-side partial aggregation:\n$plan")
    // whole-stage-codegen stages render as "*(n) " prefixes in executedPlan
    assert(plan.contains("*(1) HashAggregate") || plan.contains("*(2) HashAggregate"),
      s"aggregation fell out of codegen:\n$plan")
  }

  test("q88 brute-force KNN broadcasts the query side, never the corpus") {
    val plan = executedPlan("q88_knn_brute")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$plan")
  }
}
