package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Substring-indexed WEIGHTED Viterbi encoder — the vocabulary-scale
  * form of `TextPipeline.minCostEncode`'s inline-literal DP (the
  * unigram-LM / SentencePiece decode; reference anchor: the
  * scalar-function codegen surface of SURVEY §2.9, the same
  * inline→indexed promotion as [[UnigramViterbiKernel]]).
  *
  * The literal folds BOTH vocab halves (word-initial pieces and
  * `##`-continuations) over every char position — O(positions · |vocab|)
  * comparisons plus a |vocab|-proportional parse of the embedded
  * literal. Here the halves compile ONCE into two hash maps: a position
  * probes its FULL PREFIX against the word-initial map (at most one
  * literal entry can equal a given prefix — one lookup replaces the
  * whole fold) and its ≤ maxContLen ending substrings against the
  * continuation map. BIT-IDENTICAL by min's enumeration-order
  * insensitivity over the same relaxation set, the same
  * `least(INF, ...)` clamp, and the same ≥ INF ⇒ (unkCost, unk)
  * fixup — spec-pinned differentially against the literal path. */
final class MinCostEncodeKernel(initPieces: Array[String],
                                initCosts: Array[Long],
                                contPieces: Array[String],
                                contCosts: Array[Long],
                                inf: Long, unkCost: Long)
    extends Serializable {
  require(initPieces.length == initCosts.length &&
    contPieces.length == contCosts.length && inf > 0)

  // duplicate vocab entries are LEGAL here (the literal fold relaxes over
  // every copy; min over the multiset equals min over per-key minima), so
  // a collision keeps the cheaper cost instead of failing — unlike the
  // sum/backtrack kernels, where duplicates would change the answer
  private def buildMap(ps: Array[String], cs: Array[Long]) = {
    val m = new java.util.HashMap[String, java.lang.Long](ps.length * 2)
    var i = 0
    while (i < ps.length) {
      val prev = m.get(ps(i))
      if (prev == null || cs(i) < prev.longValue()) m.put(ps(i), cs(i))
      i += 1
    }
    m
  }
  private val initMap = buildMap(initPieces, initCosts)
  private val contMap = buildMap(contPieces, contCosts)
  private val maxContLen: Int = {
    var m = 0; var i = 0
    while (i < contPieces.length) {
      val l = contPieces(i).codePointCount(0, contPieces(i).length)
      if (l > m) m = l
      i += 1
    }
    m
  }

  /** Referenced from generated code: (min total cost, unk) for one word
    * — the literal dpSql's exact integer recurrence and UNK fixup. */
  def encode(word: UTF8String): InternalRow = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    val dp = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var m = inf
      val ic = initMap.get(new String(cps, 0, i))
      if (ic != null && ic.longValue() < m) m = ic.longValue()
      var l = 1
      val lim = math.min(maxContLen, i - 1) // continuations never cover the prefix
      while (l <= lim) {
        val cc = contMap.get(new String(cps, i - l, l))
        if (cc != null) {
          val c = dp(i - l) + cc.longValue()
          if (c < m) m = c
        }
        l += 1
      }
      dp(i) = m
      i += 1
    }
    if (dp(n) >= inf) InternalRow(unkCost, true) else InternalRow(dp(n), false)
  }
}

/** One word's minimum-cost segmentation summary — the indexed form of
  * `TextPipeline.minCostEncode`'s dpSql, one expression returning
  * struct(cost, unk). `vocab` carries the RAW (piece, cost) list with
  * `##` continuation prefixes intact (split here, exactly as the
  * literal path splits it). */
case class MinCostEncodeExpr(child: Expression, vocab: Seq[(String, Long)],
                             inf: Long, unkCost: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_cost_encode expects a string input, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("cost", LongType, nullable = false),
    StructField("unk", BooleanType, nullable = false)))

  @transient private lazy val kernel = {
    val (cont, init) = vocab.partition(_._1.startsWith("##"))
    new MinCostEncodeKernel(
      init.map(_._1).toArray, init.map(_._2).toArray,
      cont.map(_._1.stripPrefix("##")).toArray, cont.map(_._2).toArray,
      inf, unkCost)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else kernel.encode(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minCostKernel", kernel,
      classOf[MinCostEncodeKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinCostEncodeExpr {
  def apply(word: Column, vocab: Seq[(String, Long)], inf: Long,
            unkCost: Long): Column =
    GraftExprBridge.column(MinCostEncodeExpr(
      GraftExprBridge.expression(word), vocab, inf, unkCost))
}
