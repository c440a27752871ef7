package graft

import graft.functions.Hashes
import org.scalacheck.{Gen, rng}

/** Property-based tests (the reference's randomized-input runtime tests,
  * upgraded to ScalaCheck per SURVEY.md §5): algebraic laws the operators
  * rely on for distributed correctness. */
class PropertiesSpec extends SparkSpec {

  // raw ScalaCheck generators, deterministically sampled (no scalatestplus
  // bridge in the offline dep set)
  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, rng.Seed(42L + i)))
  }

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    samples(ga).lazyZip(samples(gb)).lazyZip(samples(gc)).foreach(f)

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    samples(ga).lazyZip(samples(gb)).foreach(f)

  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit = samples(ga).foreach(f)

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val vecGen = Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0))

  test("distance metrics: symmetry, identity, triangle inequality (local kernels)") {
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def euclid(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    def manhattan(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
    forAll(vecGen, vecGen, vecGen) { (a, b, c) =>
      assert(math.abs(euclid(a, b) - euclid(b, a)) < 1e-9)
      assert(euclid(a, a) === 0.0)
      assert(euclid(a, c) <= euclid(a, b) + euclid(b, c) + 1e-9)
      assert(manhattan(a, c) <= manhattan(a, b) + manhattan(b, c) + 1e-9)
      val cos = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9)
    }
  }

  test("WeightedAvgCents reduce/merge laws: merge(zero,x)=x, associative, commutative") {
    import graft.functions.Aggregators.{WeightedAvgCents => W}
    val accGen = for {
      s <- Gen.chooseNum(-1000000L, 1000000L)
      n <- Gen.chooseNum(0L, 10000L)
    } yield (s, n)
    forAll(accGen, accGen, accGen) { (x, y, z) =>
      assert(W.merge(W.zero, x) === x)
      assert(W.merge(x, y) === W.merge(y, x))
      assert(W.merge(W.merge(x, y), z) === W.merge(x, W.merge(y, z)))
    }
  }

  test("minhash signature: permutation-invariant and equal-sets-equal-sigs") {
    val shGen = Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty)).map(_.distinct)
    forAll(shGen) { sh =>
      val a = Hashes.minHashSignature(sh, 32)
      val b = Hashes.minHashSignature(scala.util.Random.shuffle(sh), 32)
      assert(a.toSeq === b.toSeq) // min over a set ignores order
    }
  }

  test("minhash estimate is within 4 sigma of true jaccard") {
    val wordGen = Gen.oneOf((1 to 50).map(i => s"w$i"))
    val setGen = Gen.listOfN(40, wordGen).map(_.distinct)
    forAll(setGen, setGen) { (x, y) =>
      whenever(x.nonEmpty && y.nonEmpty) {
        val k = 256
        val j = x.intersect(y).size.toDouble / x.union(y).distinct.size
        val sa = Hashes.minHashSignature(x, k)
        val sb = Hashes.minHashSignature(y, k)
        val est = sa.zip(sb).count { case (p, q) => p == q }.toDouble / k
        val sigma = math.sqrt(j * (1 - j) / k) + 1e-3
        assert(math.abs(est - j) <= 4 * sigma + 0.02,
          s"est=$est true=$j sigma=$sigma")
      }
    }
  }

  test("simhash: hamming distance grows with symmetric difference, bounded 0..64") {
    val wordGen = Gen.oneOf((1 to 30).map(i => s"t$i"))
    val docGen = Gen.listOfN(25, wordGen)
    forAll(docGen) { d =>
      whenever(d.nonEmpty) {
        assert(Hashes.hamming64(Hashes.simHash64(d), Hashes.simHash64(d)) === 0)
        val h = Hashes.simHash64(d)
        assert(Hashes.hamming64(h, ~h) === 64)
      }
    }
  }

  test("fnv1a64 is stable and collision-free on small distinct inputs") {
    val strs = (1 to 2000).map(i => s"shingle $i")
    assert(strs.map(Hashes.fnv1a64).distinct.size === strs.size)
    assert(Hashes.fnv1a64("abc") === Hashes.fnv1a64("abc"))
  }
}
