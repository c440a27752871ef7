package graft

import graft.operators.SuffixArray
import org.apache.spark.sql.functions._

/** Bounded-depth prefix-doubling suffix array (operators/
  * SuffixArray.scala): differential vs a brute bounded-suffix sort
  * (ASCII fixtures — Spark's UTF8 byte order and Scala's char order
  * agree there), the shorter-prefix-first contract, and the
  * longest-repeats enumeration on planted repeats. */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  private def bruteSA(docs: Seq[(Long, String)], depth: Int): Set[(Long, Long, Long)] =
    docs.flatMap { case (d, t) =>
      (0 until t.length).map(p =>
        (d, p.toLong, t.substring(p, math.min(t.length, p + depth))))
    }.sortBy { case (d, p, s) => (s, d, p) }
      .zipWithIndex.map { case ((d, p, _), i) => (d, p, i + 1L) }.toSet

  private def bruteRepeats(docs: Seq[(Long, String)], depth: Int,
                           minLen: Int, k: Int): Seq[(Long, String, Long, Long, Long, Long)] = {
    val suf = docs.flatMap { case (d, t) =>
      (0 until t.length).map(p =>
        (d, p.toLong, t.substring(p, math.min(t.length, p + depth))))
    }.sortBy { case (d, p, s) => (s, d, p) }
    suf.sliding(2).collect { case Seq((d1, p1, s1), (d2, p2, s2)) =>
      val lcp = s1.zip(s2).takeWhile { case (a, b) => a == b }.length.toLong
      (lcp, s1.take(lcp.toInt), d1, p1, d2, p2)
    }.filter(_._1 >= minLen).toSeq
      .sortBy { case (l, r, d, p, _, _) => (-l, r, d, p) }.take(k)
  }

  test("suffixArray equals the brute bounded sort on handcrafted docs " +
    "across depth/base settings") {
    val docs = Seq(
      (1L, "banana"),
      (2L, "bananas are bananas are they"),
      (3L, ""), // no suffixes
      (4L, "a"),
      (5L, "abcabcabcabcabcabcabcabc"), // periodic: heavy rank ties per round
      (6L, "the quick brown fox the quick brown cat"))
    val df = docs.toDF("doc_id", "text")
    for ((depth, base) <- Seq((4, 4), (8, 1), (16, 4), (64, 4))) {
      val got = SuffixArray.suffixArray(df, "doc_id", "text", depth, base)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === bruteSA(docs, depth), s"depth=$depth base=$base")
    }
  }

  test("suffixArray fuzz: matches the brute sort on random small-alphabet " +
    "corpora (dense tie regime)") {
    val rnd = new scala.util.Random(271828)
    for (round <- 0 until 3) {
      val docs = (0 until 12).map { i =>
        i.toLong -> (0 until 5 + rnd.nextInt(40))
          .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      val depth = Seq(8, 16, 32)(round)
      val got = SuffixArray.suffixArray(docs.toDF("doc_id", "text"),
        "doc_id", "text", depth, base = 2)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === bruteSA(docs, depth), s"round $round depth=$depth")
    }
  }

  test("construction routes agree bit-for-bit: the direct bounded-prefix " +
    "sort (the sub-crossover route) and the prefix doubling produce the " +
    "same total order, handcrafted + fuzz") {
    val rnd = new scala.util.Random(314159)
    val handcrafted = Seq(
      (1L, "banana"), (2L, "bananas are bananas are they"), (3L, ""),
      (4L, "a"), (5L, "abcabcabcabcabcabcabcabc"))
    val fuzz = (10 until 22).map { i =>
      i.toLong -> (0 until 5 + rnd.nextInt(60))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    for ((docs, depth, base) <- Seq((handcrafted, 16, 4), (handcrafted, 64, 4),
      (fuzz, 32, 2), (fuzz ++ handcrafted, 64, 4))) {
      val df = docs.toDF("doc_id", "text")
      val direct = SuffixArray.suffixArrayForTest(df, "doc_id", "text",
        depth, base, forceDoubling = false).as[(Long, Long, Long)].collect().toSet
      val doubling = SuffixArray.suffixArrayForTest(df, "doc_id", "text",
        depth, base, forceDoubling = true).as[(Long, Long, Long)].collect().toSet
      assert(direct === doubling, s"depth=$depth base=$base")
    }
  }

  test("planted prefix skew: a corpus where ~95% of suffixes share one " +
    "boilerplate prefix still builds correctly through the direct route " +
    "(the composite (prefix, doc, pos) range key splits the hot run " +
    "across partitions instead of funnelling it to one)") {
    // every doc is the same 70-char boilerplate + a tiny unique tail:
    // most depth-64 prefixes are IDENTICAL — the adversarial case for a
    // range sort keyed on the prefix alone. The range key includes
    // (doc, pos), so equal prefixes remain divisible; correctness is
    // differential vs the doubling route (which sorts 8-byte ranks).
    val boiler = "x" * 70
    val docs = (0L until 40L).map(i => i -> (boiler + s"u$i"))
    val df = docs.toDF("doc_id", "text")
    val direct = SuffixArray.suffixArrayForTest(df, "doc_id", "text",
      depth = 64, base = 4, forceDoubling = false)
      .as[(Long, Long, Long)].collect().toSet
    val doubling = SuffixArray.suffixArrayForTest(df, "doc_id", "text",
      depth = 64, base = 4, forceDoubling = true)
      .as[(Long, Long, Long)].collect().toSet
    assert(direct === doubling)
    assert(direct.size === docs.map(_._2.length).sum)
  }

  test("lcpArray: matches brute adjacent-lcp over the bounded SA; rank 1 " +
    "reports lcp 0") {
    val rnd = new scala.util.Random(9090)
    val docs = (0 until 10).map { i =>
      i.toLong -> (0 until 8 + rnd.nextInt(30))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    val depth = 16
    val suf = docs.flatMap { case (d, t) =>
      (0 until t.length).map(p =>
        (d, p.toLong, t.substring(p, math.min(t.length, p + depth))))
    }.sortBy { case (d, p, s) => (s, d, p) }
    val brute = suf.zipWithIndex.map { case ((d, p, s), i) =>
      val lcp = if (i == 0) 0L else {
        val prev = suf(i - 1)._3
        s.zip(prev).takeWhile { case (a, b) => a == b }.length.toLong
      }
      (d, p, i + 1L, lcp)
    }.toSet
    val got = SuffixArray.lcpArray(docs.toDF("doc_id", "text"),
        "doc_id", "text", depth, base = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === brute)
    assert(got.find(_._3 == 1L).get._4 === 0L)
  }

  test("lcpArray fuzz: rank-compare descent matches the brute string fold " +
    "across base/depth settings (sub-base residue and base=1 paths)") {
    val rnd = new scala.util.Random(5151)
    for ((depth, base) <- Seq((16, 4), (8, 1), (32, 2), (4, 4))) {
      val docs = (0 until 10).map { i =>
        i.toLong -> (0 until 3 + rnd.nextInt(25))
          .map(_ => ('a' + rnd.nextInt(2)).toChar).mkString // binary alphabet: long runs
      }
      val suf = docs.flatMap { case (d, t) =>
        (0 until t.length).map(p =>
          (d, p.toLong, t.substring(p, math.min(t.length, p + depth))))
      }.sortBy { case (d, p, s) => (s, d, p) }
      val brute = suf.zipWithIndex.map { case ((d, p, s), i) =>
        val lcp = if (i == 0) 0L else
          s.zip(suf(i - 1)._3).takeWhile { case (a, b) => a == b }.length.toLong
        (d, p, i + 1L, lcp)
      }.toSet
      val got = SuffixArray.lcpArray(docs.toDF("doc_id", "text"),
          "doc_id", "text", depth, base)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === brute, s"depth=$depth base=$base")
    }
  }

  test("lcp paths agree bit-for-bit: the rank-compare descent and the " +
    "prefix-fold join produce identical adjacency LCPs") {
    val rnd = new scala.util.Random(77001)
    val docs = (0 until 12).map { i =>
      i.toLong -> (0 until 5 + rnd.nextInt(30))
        .map(_ => ('a' + rnd.nextInt(2)).toChar).mkString
    }.toDF("doc_id", "text")
    for ((depth, base) <- Seq((16, 4), (8, 2))) {
      val byRank = SuffixArray.lcpPairsForTest(docs, "doc_id", "text",
        depth, base, rankCompare = true)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      val byPrefix = SuffixArray.lcpPairsForTest(docs, "doc_id", "text",
        depth, base, rankCompare = false)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(byRank === byPrefix, s"depth=$depth base=$base")
    }
  }

  test("lcp plan pin: at descent depths no depth-length string column is " +
    "anywhere in the plan — the joins move 8-byte ranks, not prefixes") {
    val docs = Seq((1L, "abcabcabc def def"), (2L, "xyz abcabcabc")).toDF("doc_id", "text")
    val depth = SuffixArray.RankCompareMinDepth // 256: the descent regime
    val plan = SuffixArray.lcpArray(docs, "doc_id", "text", depth, base = 4)
      .queryExecution.executedPlan.toString
    // the only substrings allowed are the base-char round-0 key (4) and
    // the (base-1)-char residual tail (3) — never the depth-char prefix
    // the below-crossover join carries
    assert(s"substring\\([^(]*?, $depth\\)".r.findFirstIn(plan).isEmpty,
      s"depth-char substring found in plan:\n$plan")
  }

  test("longestRepeats: planted cross-doc repeat reported at its exact " +
    "length; periodic runs cap at the depth bound; matches brute") {
    val boiler = "SHARED RUN OF TEXT!" // 19 chars, planted in docs 1 and 2
    val docs = Seq(
      (1L, s"alpha $boiler omega"),
      (2L, s"beta $boiler gamma"),
      (3L, "abababababababababababababababab"), // 32 chars, period 2
      (4L, "nothing in common here"))
    val got = SuffixArray.longestRepeats(docs.toDF("doc_id", "text"),
        "doc_id", "text", depth = 16, base = 4, minLen = 4, k = 30)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === bruteRepeats(docs, 16, 4, 30))
    // the periodic doc's self-adjacent suffixes share >= 16 chars -> the
    // cap reports exactly depth on a within-doc pair
    assert(got.exists { case (l, _, d1, _, d2, _) =>
      l == 16L && d1 == 3L && d2 == 3L })
    // the planted boilerplate appears as a cross-doc repeat (its first
    // 16 chars are shared verbatim between docs 1 and 2, so the bounded
    // lcp reports the cap)
    assert(got.exists { case (l, r, d1, _, d2, _) =>
      r.startsWith("SHARED") && d1 != d2 && l == 16L })
  }
}
