package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct: ~3% error at p=10 on 20k distinct; duplicate- and layout-invariant") {
    val n = 20000
    val base = spark.range(n).select(
      lit("g").as("grp"), concat(lit("value-"), $"id").as("v"))
    val est = Sketches.hllDistinct(base, Seq("grp"), "v", p = 10)
      .select($"hll_estimate").as[Double].head()
    // raw HLL std error = 1.04/sqrt(1024) ≈ 3.3%; allow 3 sigma
    assert(math.abs(est - n) / n < 0.10, s"estimate $est too far from $n")
    // multiplicity must not move a distinct sketch: 3 copies, same estimate
    val dup = base.union(base).union(base)
    val estDup = Sketches.hllDistinct(dup, Seq("grp"), "v", p = 10)
      .select($"hll_estimate").as[Double].head()
    assert(estDup === est)
    // partitioning must not move it either (register max is commutative)
    val estShuffled = Sketches.hllDistinct(base.repartition(17, $"v"), Seq("grp"), "v", p = 10)
      .select($"hll_estimate").as[Double].head()
    assert(estShuffled === est)
  }

  test("hllDistinct groups independently and reports zero registers") {
    val df = spark.range(300).select(
      when($"id" < 100, "a").otherwise("b").as("grp"),
      concat(lit("x"), $"id").as("v"))
    val got = Sketches.hllDistinct(df, Seq("grp"), "v", p = 6)
      .select($"grp", $"hll_estimate", $"zero_registers")
      .as[(String, Double, Long)].collect().map(r => r._1 -> r).toMap
    // group a holds 100 distinct, b 200 — the sketches must reflect that
    assert(got("a")._2 < got("b")._2)
    assert(got("a")._3 > got("b")._3) // fewer values -> more empty registers
    assert(got("a")._2 > 50 && got("a")._2 < 200)
    assert(got("b")._2 > 120 && got("b")._2 < 400)
  }

  test("hllMerge is lossless: merge(sketch(A), sketch(B)) == sketch(A union B)") {
    val a = spark.range(500).select(lit("g").as("grp"), concat(lit("a"), $"id").as("v"))
    val b = spark.range(300).select(lit("g").as("grp"), concat(lit("b"), $"id" % 200).as("v"))
    val merged = Sketches.hllMerge(
      Seq(Sketches.hllRegisters(a, Seq("grp"), "v", p = 8),
        Sketches.hllRegisters(b, Seq("grp"), "v", p = 8)), Seq("grp"))
    val direct = Sketches.hllRegisters(a.union(b), Seq("grp"), "v", p = 8)
    // register-for-register equality, both directions
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
    // and therefore the same estimate
    val em = Sketches.hllEstimate(merged, Seq("grp"), 8).select($"hll_estimate").as[Double].head()
    val ed = Sketches.hllDistinct(a.union(b), Seq("grp"), "v", p = 8).select($"hll_estimate").as[Double].head()
    assert(em === ed)
  }

  test("hllWindowedDistinct on a batch frame equals per-window hllDistinct") {
    val df = spark.range(1000).select(
      timestamp_micros(($"id" % 8) * 3600L * 1000000L).as("ts"),
      concat(lit("u"), $"id" % 97).as("v"))
    val win = Sketches.hllWindowedDistinct(df, "ts", "2 hours", "v",
        p = 6, watermark = "0 seconds")
      .select(unix_micros($"window.start").as("ws"), $"hll_estimate", $"zero_registers")
    val direct = Sketches.hllDistinct(
        df.withColumn("ws", unix_micros(window($"ts", "2 hours").getField("start"))),
        Seq("ws"), "v", p = 6)
      .select($"ws", $"hll_estimate", $"zero_registers")
    assert(win.count() === 4)
    assert(win.exceptAll(direct).isEmpty && direct.exceptAll(win).isEmpty)
  }

  test("countMin: estimate >= true count for every key; exact when w clears the key space") {
    // zipf-ish: key j appears ceil(600/j) times, j in 1..80
    val df = spark.range(1, 81).select(explode(sequence(lit(1), (lit(600) / $"id").cast("int"))).as("rep"), concat(lit("k"), $"id").as("k"))
      .select($"k")
    val truth = df.groupBy($"k").agg(count(lit(1)).as("n"))
    val w = 64 // 80 keys into 64 buckets: collisions certain
    val est = Sketches.cmLookup(Sketches.countMin(df, "k", w, 3), truth, "k", w, 3)
    val joined = truth.join(est, "k").select($"n", $"cm_est").as[(Long, Long)].collect()
    assert(joined.length === 80)
    joined.foreach { case (n, e) => assert(e >= n, s"CM under-estimated: $e < $n") }
    // wide sketch: 4096 buckets for 80 keys -> overwhelmingly no collisions
    val wide = Sketches.cmLookup(Sketches.countMin(df, "k", 4096, 3), truth, "k", 4096, 3)
    val exact = truth.join(wide, "k").filter($"cm_est" =!= $"n").count()
    assert(exact === 0L, "d=3 min over 4096-wide rows should be collision-free here")
  }

  test("countMin sketch is bounded by d*w rows, layout-invariant, and additive-mergeable") {
    val df = spark.range(5000).select(concat(lit("t"), $"id" % 300).as("k"))
    val sk = Sketches.countMin(df, "k", 256, 4)
    assert(sk.count() <= 4L * 256)
    val skShuffled = Sketches.countMin(df.repartition(13, $"k"), "k", 256, 4)
    assert(sk.exceptAll(skShuffled).isEmpty && skShuffled.exceptAll(sk).isEmpty)
    // counters add: sketch(A) + sketch(B) == sketch(A union B)
    val h = df.limit(2500)
    val t2 = df.exceptAll(h)
    val summed = Sketches.countMin(h, "k", 256, 4)
      .unionByName(Sketches.countMin(t2, "k", 256, 4))
      .groupBy($"cm_row", $"cm_bucket").agg(sum($"cm_cnt").as("cm_cnt"))
    assert(summed.exceptAll(sk).isEmpty && sk.exceptAll(summed).isEmpty)
  }
}
