package graft

import graft.functions.Aggregators
import graft.operators.Multimodal
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class MiscOpsSpec extends SparkSpec {
  import spark.implicits._

  test("WeightedAvgCents: exact integer weighted average, zero-weight safe") {
    val wavg = udaf(Aggregators.WeightedAvgCents,
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val df = Seq((1L, 100L, 1L), (1L, 200L, 3L), (2L, 50L, 0L)).toDF("k", "cents", "w")
    val got = df.groupBy("k").agg(wavg($"cents", $"w").as("a"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === (100 * 1 + 200 * 3) / 4)
    assert(got(2L) === 0L)
  }

  test("WeightedAvgCents merge is associative across partitions") {
    val wavg = udaf(Aggregators.WeightedAvgCents,
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val rows = (1 to 1000).map(i => (1L, i.toLong, (i % 7 + 1).toLong))
    val expected = {
      val num = rows.map(r => r._2 * r._3).sum
      val den = rows.map(_._3).sum
      Math.floorDiv(num, den)
    }
    val got = rows.toDF("k", "cents", "w").repartition(8)
      .groupBy("k").agg(wavg($"cents", $"w")).collect()(0).getLong(1)
    assert(got === expected)
  }

  test("multimodal: decode metadata is a pure function of payload bytes") {
    val docs = Seq((0L, "abcdef"), (1L, "xy"), (2L, "hello world")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(Multimodal.mediaFromDocuments(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    assert(meta(0L) === (("image", 6, 64 + 6 % 192, 64 + 'a' % 192, 1)))
    assert(meta(1L) === (("audio", 2, 8000 + (2 % 5) * 8000, 0, 1 + 2 % 30)))
    assert(meta(2L) === (("video", 11, 64 + 11 % 192, 64 + 'h' % 192, 1 + 11 % 24)))
  }

  test("multimodal: frame sampling strides per video without materializing") {
    val docs = Seq((2L, "hello world")).toDF("doc_id", "text") // video, 12 frames
    val frames = Multimodal.sampleFrames(
      Multimodal.decodeMeta(Multimodal.mediaFromDocuments(docs, "doc_id", "text")), stride = 4)
      .as[(Long, Int)].collect().toSeq.sorted
    assert(frames === Seq((2L, 0), (2L, 4), (2L, 8)))
  }

  test("multimodal: resize yields fixed-size payloads, schema preserved") {
    val docs = Seq((0L, "abcdef"), (1L, "x")).toDF("doc_id", "text")
    val resized = Multimodal.resize(
      Multimodal.mediaFromDocuments(docs, "doc_id", "text"), nBytes = 4)
    assert(resized.schema.fieldNames.toSeq === Seq("doc_id", "media_type", "payload"))
    val byId = resized.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    assert(byId(0L).toSeq === "abcd".getBytes("UTF-8").toSeq) // truncated
    assert(byId(1L).toSeq === "xxxx".getBytes("UTF-8").toSeq) // cyclic pad
  }

  test("multimodal: null payload rows survive decode/resize/extract as empty media") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("media_type", StringType),
      StructField("payload", BinaryType, nullable = true)))
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0L, "image", null),
        Row(1L, "image", "abc".getBytes("UTF-8"))),
      schema)
    // ADVICE r2: a single null payload must not NPE the whole job
    val meta = Multimodal.decodeMeta(media).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("n_bytes")).toMap
    assert(meta(0L) === 0 && meta(1L) === 3)
    val resized = Multimodal.resize(media, nBytes = 4).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq).toMap
    assert(resized(0L) === Seq[Byte](0, 0, 0, 0))
    val emb = Multimodal.extractFeatures(media, dim = 4).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]]("embedding")).toMap
    assert(emb(0L).forall(_ == 0.0f) && emb(1L).exists(_ > 0.0f))
  }

  test("multimodal: extracted features feed the ANN stack end to end") {
    val docs = Seq((0L, "aaaa bbbb"), (1L, "aaaa bbbc"), (2L, "zzzz qqqq rrr"))
      .toDF("doc_id", "text")
    val emb = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(docs, "doc_id", "text"), dim = 8)
    assert(emb.schema("embedding").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
    // media -> embedding -> cosine KNN: doc 1 must be doc 0's nearest
    val knn = graft.operators.Similarity.bruteForceTopK(
      emb, emb.filter($"doc_id" === 0L), "doc_id", "embedding", "doc_id", k = 2)
      .orderBy($"rank").collect()
    assert(knn.head.getAs[Long]("nbr_id") === 1L)
  }

  test("zipWithIndex assigns contiguous global indices across many partitions") {
    val df = (1L to 1000L).toDF("v").repartition(16)
    val idx = graft.operators.Partitioning.zipWithIndex(df, "idx")
      .select("idx").as[Long].collect().sorted
    assert(idx === (0L until 1000L).toArray)
  }

  test("zipWithIndex on sorted input equals global rank regardless of partitioning") {
    val df = (1L to 500L).toDF("v").repartition(8).orderBy("v")
    val got = graft.operators.Partitioning.zipWithIndex(df, "idx")
      .as[(Long, Long)].collect().toMap
    assert((1L to 500L).forall(v => got(v) === v - 1))
  }

  test("zipWithUniqueId is unique in one pass (no contiguity guarantee)") {
    val df = (1L to 1000L).toDF("v").repartition(16)
    val ids = graft.operators.Partitioning.zipWithUniqueId(df, "uid")
      .select("uid").as[Long].collect()
    assert(ids.distinct.length === 1000)
  }

  test("rankingMetrics: recall/MRR/nDCG from hand-checked rankings") {
    val approx = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L),
      (2L, 1L, 20L), (2L, 2L, 21L)).toDF("query_id", "rank", "nbr_id")
    val exact = Seq((1L, 11L), (1L, 12L), (1L, 99L), (2L, 77L))
      .toDF("query_id", "nbr_id")
    val got = graft.operators.Similarity.rankingMetrics(approx, exact, k = 3)
      .as[(Long, Double, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // q1: hits at ranks 2,3 → recall 2/3, MRR 1/2,
    // nDCG = (1/log2(3)+1/log2(4)) / (1/log2(2)+1/log2(3))
    val dcg = 1.0 / (math.log(3) / math.log(2)) + 1.0 / 2.0
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2))
    assert(got(1L) === ((r6(2.0 / 3), 0.5, r6(dcg / idcg))))
    // q2: no hits → all zero except recall 0
    assert(got(2L) === ((0.0, 0.0, 0.0)))
  }

  test("rrfFuse: paper formula, both-list docs dominate, n_rankers counts lists") {
    val lex = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "r")
    val sem = Seq((11L, 1L), (13L, 2L)).toDF("id", "r")
    val got = graft.operators.Similarity.rrfFuse(Seq(lex, sem), "id", "r")
      .as[(Long, Double, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    def rrf(rs: Long*) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(11L) === ((rrf(2L, 1L), 2L)))   // in both lists
    assert(got(10L) === ((rrf(1L), 1L)))
    assert(got(12L) === ((rrf(3L), 1L)))
    assert(got(13L) === ((rrf(2L), 1L)))
    // a doc ranked #2+#1 across lists outscores every single-list doc,
    // even one ranked #1 — the fusion property that makes RRF robust
    assert(got(11L)._1 > got(10L)._1)
  }

  test("bitextMarginMine: differential vs a brute-force integer replica, " +
    "hub suppression, negative-dot exclusion") {
    import graft.operators.Similarity
    def mk(rows: (Long, Boolean, Seq[Double])*) =
      rows.toSeq.map { case (id, isa, v) => (id, isa, v.map(_.toFloat)) }
        .toDF("id", "isa", "vec")
    // brute replica of the exact integer arithmetic
    def brute(rows: Seq[(Long, Boolean, Seq[Double])], k: Int,
              minM: Long): Set[(Long, Long, Long, Long)] = {
      def qz(v: Seq[Double]) = v.map(x => math.floor(x.toFloat.toDouble * 1000).toLong)
      val as = rows.filter(_._2).map(r => (r._1, qz(r._3)))
      val bs = rows.filterNot(_._2).map(r => (r._1, qz(r._3)))
      val dots = for { (ai, aw) <- as; (bi, bw) <- bs }
        yield (ai, bi, aw.zip(bw).map { case (x, y) => x * y }.sum)
      def topSum(group: Seq[(Long, Long)]) = // (otherId, dot) -> top-k sum
        group.sortBy { case (oid, d) => (-d, oid) }.take(k).map(_._2).sum
      val sA = dots.groupBy(_._1).map { case (a, g) => a -> topSum(g.map(t => (t._2, t._3))) }
      val sB = dots.groupBy(_._2).map { case (b, g) => b -> topSum(g.map(t => (t._1, t._3))) }
      dots.filter { case (a, b, d) => sA(a) + sB(b) > 0 && d >= 0 }
        .map { case (a, b, d) =>
          (a, b, d, 2L * k * d * 1000000L / (sA(a) + sB(b))) }
        .groupBy(_._1).values.map(_.minBy { case (_, b, _, m) => (-m, b) })
        .filter(_._4 >= minM).toSet
    }
    val rows: Seq[(Long, Boolean, Seq[Double])] = Seq(
      (1L, true, Seq(0.5, 0.0, 0.1)), (2L, true, Seq(0.0, 0.4, 0.2)),
      (3L, true, Seq(-0.3, -0.4, 0.0)),
      (10L, false, Seq(0.45, 0.05, 0.1)), (11L, false, Seq(0.05, 0.45, 0.15)),
      (12L, false, Seq(0.3, 0.3, 0.3)), (13L, false, Seq(0.2, 0.1, 0.05)))
    val got = Similarity.bitextMarginMine(mk(rows: _*), "id", "vec",
        isSideA = col("isa"), k = 2, minMarginScaled = 0L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === brute(rows, k = 2, minM = 0L))
    // a-doc 3 points away from every b: all dots negative -> excluded
    assert(!got.exists(_._1 == 3L))
    // hub suppression: b12 is closest-by-dot to NOTHING once normalized —
    // each a keeps its aligned counterpart, not the hub
    assert(got.find(_._1 == 1L).get._2 === 10L)
    assert(got.find(_._1 == 2L).get._2 === 11L)
    // threshold path prunes low-margin winners identically to brute
    val gotT = Similarity.bitextMarginMine(mk(rows: _*), "id", "vec",
        isSideA = col("isa"), k = 2, minMarginScaled = 1050000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(gotT === brute(rows, k = 2, minM = 1050000L))
  }
}
