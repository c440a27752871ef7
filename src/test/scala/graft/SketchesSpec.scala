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
}
