package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Deterministic per-row signature hashes for near-duplicate detection:
  * MinHash signatures, SimHash, and a rolling-polynomial fingerprint.
  *
  * These are genuine per-row imperative loops (k permutations × n shingles),
  * so they are plain Scala functions exposed as UDFs for now; they sit at a
  * pipeline stage where the surrounding plan (shingling, LSH banding,
  * bucket joins) stays declarative. TODO(perf): promote to codegen'd
  * Catalyst expressions if bench shows them hot.
  */
object Hashes {

  /** 64-bit FNV-1a over UTF-8 bytes — stable across JVMs and releases. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private val MersennePrime = (1L << 61) - 1
  private val MaxHash = (1L << 32) - 1

  /** Fixed affine permutation parameters, seeded for determinism. */
  private def perms(k: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42L)
    Array.fill(k)((1L + (rnd.nextLong().abs % (MersennePrime - 1)),
      rnd.nextLong().abs % MersennePrime))
  }

  /** MinHash signature of a set of shingle strings; k 32-bit values.
    * sig_i = min over shingles of ((a_i * h + b_i) mod 2^61-1) mod 2^32,
    * with h = FNV-1a(shingle) folded to [0, 2^61). Multiplication uses
    * Math.multiplyHigh-free modular arithmetic on 61-bit values. */
  def minHashSignature(shingles: Seq[String], k: Int): Array[Long] = {
    val ps = permCache.getOrElseUpdate(k, perms(k))
    val out = Array.fill(k)(Long.MaxValue)
    if (shingles == null) return out.map(_ => MaxHash)
    val hs = shingles.iterator.map(s => java.lang.Long.remainderUnsigned(fnv1a64(s), MersennePrime)).toArray
    var i = 0
    while (i < k) {
      val (a, b) = ps(i)
      var m = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        val v = (mulMod61(a, hs(j)) + b) % MersennePrime
        val v32 = v & MaxHash
        if (v32 < m) m = v32
        j += 1
      }
      out(i) = if (hs.isEmpty) MaxHash else m
      i += 1
    }
    out
  }

  /** (a * b) mod (2^61-1) without overflow, via 128-bit split. */
  private def mulMod61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product mod 2^61-1: (hi*2^64 + lo) mod p, 2^64 mod p = 8
    val loMod = java.lang.Long.remainderUnsigned(lo, MersennePrime)
    val hiMod = java.lang.Long.remainderUnsigned(hi, MersennePrime)
    (mulSmallMod61(hiMod, 8) + loMod) % MersennePrime
  }

  private def mulSmallMod61(a: Long, b: Long): Long = {
    // b <= 8 so a*b fits in 64 bits unsigned for a < 2^61
    java.lang.Long.remainderUnsigned(a * b, MersennePrime)
  }

  private val permCache = scala.collection.concurrent.TrieMap.empty[Int, Array[(Long, Long)]]

  /** 64-bit SimHash over token strings (unweighted). */
  def simHash64(toks: Seq[String]): Long = {
    if (toks == null || toks.isEmpty) return 0L
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h = fnv1a64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Content fingerprint: FNV-1a over lowercase alphanumeric normalization. */
  def fingerprint(text: String): Long = {
    if (text == null) 0L
    else fnv1a64(text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim)
  }

  // Column-level wrappers
  val minhashUdf: Int => org.apache.spark.sql.expressions.UserDefinedFunction =
    k => udf((s: Seq[String]) => minHashSignature(s, k))
  def minhash(shingles: Column, k: Int): Column = minhashUdf(k)(shingles)
  val simhashUdf = udf((toks: Seq[String]) => simHash64(toks))
  def simhash(toks: Column): Column = simhashUdf(toks)
  val hammingUdf = udf((a: Long, b: Long) => hamming64(a, b))
  val fingerprintUdf = udf((t: String) => fingerprint(t))
  def docFingerprint(text: Column): Column = fingerprintUdf(text)
}
