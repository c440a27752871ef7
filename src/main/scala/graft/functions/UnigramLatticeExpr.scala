package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Substring-indexed unigram-LM lattice kernel — the vocabulary-scale
  * form of `TextPipeline.softEmCounts` / `unigramSampleEncode`'s
  * inline-literal folds (Kudo 2018's forward-backward E-step and FFBS
  * sampler; reference anchor: the scalar-function codegen surface of
  * SURVEY §2.9, the same inline→indexed promotion as
  * [[WordpieceEncodeExpr]]).
  *
  * The inline fold aggregates over the FULL vocabulary literal at every
  * character position — O(positions · |vocab|) piece comparisons, with
  * the vocabulary re-parsed into the expression tree once per pass
  * (forward, backward, posterior: three copies). Fine at gate scale
  * (~80 pieces); prohibitive at a real SentencePiece seed (100k–1M
  * candidates) — see IterBench `unigram` for the measured slopes. Here
  * the vocabulary compiles ONCE on the driver into a hash index
  * (piece → canonical rank + weight), ships with the serialized plan as
  * a reference object, and each position looks up only its ≤ maxPieceLen
  * ending substrings — O(positions · maxPieceLen), |vocab|-independent.
  *
  * BIT-IDENTICAL to the literal fold by construction: the literal fold
  * adds, in canonical vocab order, each entry's term — exactly 0.0 for
  * non-matching entries, and x + 0.0 == x for the non-negative partial
  * sums involved — so summing only the MATCHING entries in canonical
  * rank order performs the identical IEEE-754 operation sequence on the
  * identical operands. Weights enter as the same exact-integer quotient
  * ((cnt + scale) / Σ(cnt + scale), both < 2^53), posteriors use the
  * same ((α·w)·β)/Z·scale multiplication order and ⌊x + 0.5⌋
  * fixed-pointing, and the sampler's per-step uniform draw replays the
  * same fnv1a64(doc:widx:pos:salt) >>> 11 / 2^53 device. The specs pin
  * both paths byte-identical on the gate fixtures. */
final class UnigramLatticeKernel(pieces: Array[String], counts: Array[Long],
                                 scale: Long, salt: String)
    extends Serializable {
  require(pieces.length == counts.length && pieces.nonEmpty && scale >= 1)

  private val total: Long = {
    var s = 0L; var i = 0
    while (i < counts.length) { s += counts(i) + scale; i += 1 }
    s
  }
  require(total < (1L << 53) && total > 0,
    s"weight denominator $total must be an exact double (< 2^53)")

  // piece -> canonical rank; weight per rank as the SAME double the SQL
  // literal derives: CAST(cnt + scale AS DOUBLE) / CAST(total AS DOUBLE)
  private val rankOf = {
    val m = new java.util.HashMap[String, Integer](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      require(m.put(pieces(i), i) == null, s"duplicate vocab piece '${pieces(i)}'")
      i += 1
    }
    m
  }
  private val w: Array[Double] = {
    val a = new Array[Double](pieces.length)
    var i = 0
    while (i < a.length) { a(i) = (counts(i) + scale).toDouble / total.toDouble; i += 1 }
    a
  }
  private val maxLen: Int = {
    var m = 1; var i = 0
    while (i < pieces.length) {
      val l = pieces(i).codePointCount(0, pieces(i).length)
      if (l > m) m = l
      i += 1
    }
    m
  }
  private val scaleD: Double = scale.toDouble

  /** Matching ranks for pieces ENDING at 1-based position `i` (cps is the
    * word's code points), ascending rank — the canonical fold order.
    * Returns a packed array of ranks, `nHits` of them meaningful. */
  private def hitsEnding(cps: Array[Int], i: Int, ranks: Array[Int]): Int = {
    var n = 0
    var l = 1
    val lim = math.min(maxLen, i)
    while (l <= lim) {
      val r = rankOf.get(new String(cps, i - l, l))
      if (r != null) { ranks(n) = r.intValue(); n += 1 }
      l += 1
    }
    // ≤ maxLen entries: insertion sort by rank
    var a = 1
    while (a < n) {
      val v = ranks(a); var b = a - 1
      while (b >= 0 && ranks(b) > v) { ranks(b + 1) = ranks(b); b -= 1 }
      ranks(b + 1) = v; a += 1
    }
    n
  }

  /** Matching ranks for pieces STARTING at 0-based position `s0`,
    * ascending rank. */
  private def hitsStarting(cps: Array[Int], s0: Int, ranks: Array[Int]): Int = {
    var n = 0
    var l = 1
    val lim = math.min(maxLen, cps.length - s0)
    while (l <= lim) {
      val r = rankOf.get(new String(cps, s0, l))
      if (r != null) { ranks(n) = r.intValue(); n += 1 }
      l += 1
    }
    var a = 1
    while (a < n) {
      val v = ranks(a); var b = a - 1
      while (b >= 0 && ranks(b) > v) { ranks(b + 1) = ranks(b); b -= 1 }
      ranks(b + 1) = v; a += 1
    }
    n
  }

  private def lenOf(rank: Int): Int = {
    val p = pieces(rank); p.codePointCount(0, p.length)
  }

  private def alphaArr(cps: Array[Int]): Array[Double] = {
    val n = cps.length
    val al = new Array[Double](n + 1)
    al(0) = 1.0
    val ranks = new Array[Int](maxLen)
    var i = 1
    while (i <= n) {
      val k = hitsEnding(cps, i, ranks)
      var s = 0.0
      var h = 0
      while (h < k) { s += al(i - lenOf(ranks(h))) * w(ranks(h)); h += 1 }
      al(i) = s
      i += 1
    }
    al
  }

  /** Referenced from generated code — must stay public. Forward masses
    * α(0..n) as an array column, bit-identical to the literal alSql. */
  def alphas(word: UTF8String): ArrayData = {
    val cps = word.toString.codePoints().toArray
    new GenericArrayData(alphaArr(cps))
  }

  /** Referenced from generated code. Per-occurrence fixed-point
    * posteriors: one (piece, ⌊γ·scale + 0.5⌋) row per lattice edge, in
    * the literal poSql's order (position ascending, canonical vocab
    * order within a position), bit-identical values. */
  def posteriors(word: UTF8String): ArrayData = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    val al = alphaArr(cps)
    // backward, reversed: be(j) = β at n-j, over pieces STARTING there
    val be = new Array[Double](n + 1)
    be(0) = 1.0
    val ranks = new Array[Int](maxLen)
    var j = 1
    while (j <= n) {
      val k = hitsStarting(cps, n - j, ranks)
      var s = 0.0
      var h = 0
      while (h < k) { s += be(j - lenOf(ranks(h))) * w(ranks(h)); h += 1 }
      be(j) = s
      j += 1
    }
    val z = al(n)
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * 2)
    var i = 1
    while (i <= n) {
      val k = hitsEnding(cps, i, ranks)
      var h = 0
      while (h < k) {
        val r = ranks(h)
        val l = lenOf(r)
        // the literal's multiplication order: (((α·w)·β)/Z)·scale + 0.5
        val f = math.floor(al(i - l) * w(r) * be(n - i) / z * scaleD + 0.5).toLong
        out += InternalRow(UTF8String.fromString(pieces(r)), f)
        h += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Referenced from generated code. The FFBS walk over a precomputed α
    * array ([[alphas]] per distinct word): at each boundary, fold the
    * matching pieces in canonical order accumulating mass; the first
    * candidate pushing the cumulative past u·α(pos) is sampled — u the
    * fnv1a64(doc:widx:pos:salt) unit draw, bit-identical to the literal
    * walkSql (a stalled boundary — only possible on a vocab the caller's
    * coverage check rejects — leaves the walk stuck, same as the SQL). */
  def sampleSeg(word: UTF8String, alData: ArrayData, doc: UTF8String,
                widx: Long): ArrayData = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    val al = alData.toDoubleArray()
    val ranks = new Array[Int](maxLen)
    val ps = new scala.collection.mutable.ArrayBuffer[Any](math.min(n, 8))
    var pos = n
    var step = 0
    val docS = doc.toString
    while (step < n && pos > 0) {
      val u = (Fnv1a64Expr.hash(UTF8String.fromString(
        s"$docS:$widx:$pos:$salt")) >>> 11).toDouble / 9007199254740992.0
      val k = hitsEnding(cps, pos, ranks)
      var cum = 0.0
      var bl = 0
      var h = 0
      val thr = u * al(pos)
      while (h < k) {
        val r = ranks(h)
        val l = lenOf(r)
        cum += al(pos - l) * w(r)
        if (bl == 0 && cum > thr) bl = l
        h += 1
      }
      if (bl == 0) pos = 0 // stalled (unreachable under the coverage check)
      else {
        ps += UTF8String.fromString(new String(cps, pos - bl, bl))
        pos -= bl
      }
      step += 1
    }
    new GenericArrayData(ps.reverse.toArray)
  }
}

/** α(0..n) of one word's segmentation lattice under the kernel's vocab —
  * the indexed form of `unigramSampleEncode`'s alSql. */
case class UnigramAlphaExpr(child: Expression, vocab: Seq[(String, Long)],
                            scale: Long) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_alphas expects a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val kernel =
    new UnigramLatticeKernel(vocab.map(_._1).toArray, vocab.map(_._2).toArray,
      scale, salt = "")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else kernel.alphas(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramKernel", kernel,
      classOf[UnigramLatticeKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.alphas($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramAlphaExpr {
  def apply(word: Column, vocab: Seq[(String, Long)], scale: Long): Column =
    GraftExprBridge.column(
      UnigramAlphaExpr(GraftExprBridge.expression(word), vocab, scale))
}

/** Per-occurrence fixed-point lattice posteriors of one word — the
  * indexed form of `softEmCounts`'s al/be/po chain, one expression. */
case class UnigramPosteriorsExpr(child: Expression, vocab: Seq[(String, Long)],
                                 scale: Long) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_posteriors expects a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p", StringType, nullable = false),
    StructField("f", LongType, nullable = false))), containsNull = false)

  @transient private lazy val kernel =
    new UnigramLatticeKernel(vocab.map(_._1).toArray, vocab.map(_._2).toArray,
      scale, salt = "")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else kernel.posteriors(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramKernel", kernel,
      classOf[UnigramLatticeKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.posteriors($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramPosteriorsExpr {
  def apply(word: Column, vocab: Seq[(String, Long)], scale: Long): Column =
    GraftExprBridge.column(
      UnigramPosteriorsExpr(GraftExprBridge.expression(word), vocab, scale))
}

/** One word occurrence's FFBS-sampled segmentation — the indexed form of
  * `unigramSampleEncode`'s walkSql. Children: (word, α array from
  * [[UnigramAlphaExpr]], doc id AS STRING, word index). */
case class UnigramSampleSegExpr(word: Expression, alphas: Expression,
                                doc: Expression, widx: Expression,
                                vocab: Seq[(String, Long)], scale: Long,
                                salt: String) extends Expression {
  override def children: Seq[Expression] = Seq(word, alphas, doc, widx)
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (word.dataType == StringType &&
        alphas.dataType.isInstanceOf[ArrayType] &&
        alphas.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
        doc.dataType == StringType && widx.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "unigram_sample_seg expects (string, array<double>, string, bigint), " +
        s"got (${children.map(_.dataType.sql).mkString(", ")})")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val kernel =
    new UnigramLatticeKernel(vocab.map(_._1).toArray, vocab.map(_._2).toArray,
      scale, salt)

  override def eval(input: InternalRow): Any = {
    val w = word.eval(input); val a = alphas.eval(input)
    val d = doc.eval(input); val x = widx.eval(input)
    if (w == null || a == null || d == null || x == null) null
    else kernel.sampleSeg(w.asInstanceOf[UTF8String], a.asInstanceOf[ArrayData],
      d.asInstanceOf[UTF8String], x.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramKernel", kernel,
      classOf[UnigramLatticeKernel].getName)
    val w = word.genCode(ctx); val a = alphas.genCode(ctx)
    val d = doc.genCode(ctx); val x = widx.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    if (nullable) {
      ev.copy(code = code"""
        ${w.code}
        ${a.code}
        ${d.code}
        ${x.code}
        boolean ${ev.isNull} = ${w.isNull} || ${a.isNull} || ${d.isNull} || ${x.isNull};
        $javaType ${ev.value} = ${ev.isNull} ? null :
          $ref.sampleSeg(${w.value}, ${a.value}, ${d.value}, ${x.value});
      """)
    } else {
      ev.copy(code = code"""
        ${w.code}
        ${a.code}
        ${d.code}
        ${x.code}
        $javaType ${ev.value} = $ref.sampleSeg(${w.value}, ${a.value}, ${d.value}, ${x.value});
      """, isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(word = newChildren(0), alphas = newChildren(1),
      doc = newChildren(2), widx = newChildren(3))
}

object UnigramSampleSegExpr {
  def apply(word: Column, alphas: Column, doc: Column, widx: Column,
            vocab: Seq[(String, Long)], scale: Long, salt: String): Column =
    GraftExprBridge.column(UnigramSampleSegExpr(
      GraftExprBridge.expression(word), GraftExprBridge.expression(alphas),
      GraftExprBridge.expression(doc), GraftExprBridge.expression(widx),
      vocab, scale, salt))
}
