package graft

/** Mirrors the driver's smoke check: SparkEntry.entry on sf0.001 → rows>0. */
class EntrySmokeSpec extends SparkSpec {
  test("SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
