package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Merge-table-indexed BPE(-dropout) encode kernel — one word OCCURRENCE
  * segmented under a TRAINED merge table with per-opportunity dropout
  * (Provilkov et al. 2020), as a native codegen'd expression (reference
  * anchor: the code-generated scalar surface of SURVEY §2.9; same
  * promotion as [[UnigramViterbiKernel]] / [[MinCostEncodeKernel]]).
  *
  * The literal SQL path chains one interpreted `aggregate` fold per
  * merge (or per non-overlapping merge BATCH), so a production 10k–32k
  * merge table is a 10k-deep plan of interpreted aggregate lambdas per
  * word occurrence — the exact cliff genre the unigram kernels measured
  * and killed (IterBench `bpedrop` has the slopes for all three paths).
  * Here the merge table compiles ONCE on the driver; per occurrence the
  * kernel runs the SAME algorithm as the SQL fold — for each merge in
  * rank order, one greedy-leftmost pending-carry pass — as a plain JVM
  * loop, with a present-symbol set skipping merges whose left or right
  * symbol does not occur in the word's CURRENT symbol array (a skipped
  * pass has no fuse opportunity, hence no draw: draw-sequence-exact).
  *
  * BIT-IDENTICAL to the per-merge literal fold by construction, not by
  * argument: same pass structure, same draw keys — the draw at merge
  * rank k, fold step j of that merge's own pass, is
  * `(fnv1a64(len(doc) ':' doc ':' widx ':' k ':' j ':' salt) >>> 11)
  * % 1000 < dropMille` through the SAME [[Fnv1a64Expr.hash]] bytes the
  * SQL path concatenates (the doc id is length-prefixed so an id
  * containing ':' cannot alias another (doc, widx, k, j) tuple) — and
  * the same symbol seeding: code points + '</w>', exactly what the SQL
  * path's `split(word, '')` produces (Spark 4's empty-pattern split is
  * code-point exact — see TextPipeline.symSeed). Spec-pinned
  * differentially against both literal paths. */
final class BpeDropoutKernel(lefts: Array[String], rights: Array[String],
                             dropMille: Long, salt: String) extends Serializable {
  require(lefts.length == rights.length)
  require(dropMille >= 0 && dropMille <= 1000)

  private val fused: Array[String] =
    Array.tabulate(lefts.length)(i => lefts(i) + rights(i))

  private def drop(docLen: Int, doc: String, widx: Long, k: Int, j: Int): Boolean =
    if (dropMille == 0L) false // (x % 1000) < 0 is never true — hash elided
    else if (dropMille == 1000L) true // (x % 1000) < 1000 always — hash elided
    else {
      val key = new java.lang.StringBuilder(doc.length + salt.length + 24)
        .append(docLen).append(':').append(doc).append(':').append(widx)
        .append(':').append(k).append(':').append(j).append(':').append(salt)
      (Fnv1a64Expr.hash(UTF8String.fromString(key.toString)) >>> 11) % 1000L <
        dropMille
    }

  /** Referenced from generated code. */
  def encode(doc: UTF8String, widx: Long, word: UTF8String): ArrayData = {
    val docStr = doc.toString
    val docLen = doc.numChars()
    val cps = word.toString.codePoints().toArray
    var cur = new Array[String](cps.length + 1)
    var i = 0
    while (i < cps.length) {
      cur(i) = new String(Character.toChars(cps(i))); i += 1
    }
    cur(cps.length) = "</w>"
    val present = new java.util.HashSet[String](cur.length * 2)
    cur.foreach(present.add)
    var k = 0
    while (k < lefts.length) {
      val l = lefts(k)
      val r = rights(k)
      if (present.contains(l) && present.contains(r)) {
        // merge rank k+1: one greedy-leftmost pass — the literal fold's
        // exact mechanics (pending carry; a fused token never re-merges
        // within its own pass; a DROPPED fuse emits pending and carries
        // the right symbol, re-exposing the boundary to the next rank)
        val out = new scala.collection.mutable.ArrayBuffer[String](cur.length)
        var pending = ""
        var changed = false
        var j = 1
        while (j <= cur.length) {
          val x = cur(j - 1)
          if (pending.isEmpty) pending = x
          else if (pending == l && x == r &&
              !drop(docLen, docStr, widx, k + 1, j)) {
            out += fused(k); pending = ""; changed = true
          } else { out += pending; pending = x }
          j += 1
        }
        if (pending.nonEmpty) out += pending
        if (changed) {
          cur = out.toArray
          present.clear()
          cur.foreach(present.add)
        }
      }
      k += 1
    }
    val arr = new Array[Any](cur.length)
    i = 0
    while (i < cur.length) { arr(i) = UTF8String.fromString(cur(i)); i += 1 }
    new GenericArrayData(arr)
  }
}

/** One word occurrence's BPE-dropout symbol array —
  * `(doc id as string, word index, word) -> array<string>`; see
  * [[BpeDropoutKernel]]. */
case class BpeDropoutEncodeExpr(first: Expression, second: Expression,
                                third: Expression,
                                merges: Seq[(String, String)],
                                dropMille: Long, salt: String)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == LongType &&
        third.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bpe_dropout_encode expects (string, bigint, string) inputs, got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val kernel = new BpeDropoutKernel(
    merges.map(_._1).toArray, merges.map(_._2).toArray, dropMille, salt)

  override protected def nullSafeEval(d: Any, w: Any, t: Any): Any =
    kernel.encode(d.asInstanceOf[UTF8String], w.asInstanceOf[Long],
      t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDropoutKernel", kernel,
      classOf[BpeDropoutKernel].getName)
    defineCodeGen(ctx, ev, (d, w, t) => s"$ref.encode($d, $w, $t)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeDropoutEncodeExpr {
  def apply(doc: Column, widx: Column, word: Column,
            merges: Seq[(String, String)], dropMille: Long,
            salt: String): Column =
    GraftExprBridge.column(BpeDropoutEncodeExpr(
      GraftExprBridge.expression(doc), GraftExprBridge.expression(widx),
      GraftExprBridge.expression(word), merges, dropMille, salt))
}
