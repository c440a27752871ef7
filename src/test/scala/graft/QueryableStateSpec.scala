package graft

import graft.streaming.QueryableState
import org.apache.spark.sql.functions._

/** Queryable state via the State Data Source: the keyed state written by the
  * flatMapGroupsWithState running aggregate, read back OFFLINE from the
  * checkpoint, must equal the batch aggregate — and the read must come from
  * `format("statestore")`, not the sink. */
class QueryableStateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("state read from checkpoint equals the batch aggregate") {
    val got = QueryableState.stateFrame(spark, dir)
      .orderBy("user_id").collect()
    val want = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("sum_millis"))
      .orderBy("user_id").collect()
    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0), "user_id")
      assert(g.getLong(1) == w.getLong(1), s"n_events for user ${g.getLong(0)}")
      assert(g.getLong(2) == w.getLong(2), s"sum_millis for user ${g.getLong(0)}")
    }
  }

  test("materialize is idempotent: second call reuses the completed checkpoint") {
    val p1 = QueryableState.materialize(spark, dir)
    val m1 = new java.io.File(p1, "_QS_DONE").lastModified()
    val p2 = QueryableState.materialize(spark, dir)
    assert(p1 == p2)
    assert(new java.io.File(p2, "_QS_DONE").lastModified() == m1,
      "second materialize must not rebuild the checkpoint")
  }

  test("transformWithState named state var read by stateVarName equals batch aggregate") {
    val got = QueryableState.twsStateFrame(spark, dir)
      .orderBy("user_id").collect()
    val want = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("sum_millis"))
      .orderBy("user_id").collect()
    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0), "user_id")
      assert(g.getLong(1) == w.getLong(1), s"n_events for user ${g.getLong(0)}")
      assert(g.getLong(2) == w.getLong(2), s"sum_millis for user ${g.getLong(0)}")
    }
  }

  test("time travel: state at each committed batch equals the id-prefix aggregate; last batch = full") {
    import org.apache.spark.sql.functions.{count => cnt}
    val maxId = Tables.events(spark, dir).agg(max("event_id")).head().getLong(0)
    def prefixAgg(hi: Long) = Tables.events(spark, dir)
      .filter(col("event_id") <= hi)
      .groupBy("user_id")
      .agg(cnt(lit(1)).as("n"), sum(round(col("value") * 1000).cast("long")).as("s"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    for (b <- Seq(0L, 1L, 3L)) {
      val hi = if (b == 3) Long.MaxValue else (b + 1) * maxId / 4
      val got = QueryableState.stateAtBatch(spark, dir, b)
        .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === prefixAgg(hi), s"state@batch $b != prefix aggregate (id <= $hi)")
    }
    // monotonicity: totals strictly grow across the timeline
    def total(b: Long) = QueryableState.stateAtBatch(spark, dir, b)
      .agg(sum("n_events")).head().getLong(0)
    assert(total(0) < total(1) && total(1) < total(3))
  }

  test("change feed: post-images per batch chain to the time-travel snapshots") {
    val feed = QueryableState.stateChangeFeed(spark, dir, 0, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(feed.nonEmpty && feed.forall(_._2 == "update"),
      "running-agg state only ever upserts")
    // the LAST post-image per key up to batch b == the state read at b
    for (b <- Seq(1L, 3L)) {
      val lastImage = feed.filter(_._1 <= b).groupBy(_._3)
        .map { case (k, rows) => (k, rows.maxBy(_._1)._4, rows.maxBy(_._1)._5) }
        .toSeq.sortBy(_._1)
      val snap = QueryableState.stateAtBatch(spark, dir, b)
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(lastImage === snap, s"change-feed replay != snapshot at batch $b")
    }
  }

  test("reader exposes per-partition provenance (partition_id), state is hash-partitioned") {
    val raw = spark.read.format("statestore")
      .load(QueryableState.materialize(spark, dir))
    assert(raw.columns.contains("partition_id"))
    val nParts = raw.select("partition_id").distinct().count()
    assert(nParts > 1, s"expected state spread across >1 store partition, got $nParts")
  }
}
