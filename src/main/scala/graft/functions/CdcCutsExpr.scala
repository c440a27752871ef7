package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The content-defined-chunking cut list of one document as a native
  * Catalyst expression — the codegen'd form of
  * `TextPipeline.cdcChunks`'s boundary filter (reference anchor: the
  * code-generated scalar surface of SURVEY §2.9, the
  * [[ShingleHashesExpr]] promotion applied to CDC).
  *
  * The SQL form evaluates `fnv1a64(substring(...))` inside a
  * higher-order `filter` lambda — and Spark's array HOFs run the lambda
  * INTERPRETED, one expression-tree walk per character position (5.5×
  * the aligned sibling's wall at sf0.1). Here the whole per-document
  * scan is one JVM loop: each window is a zero-copy UTF8String slice
  * hashed by the SAME [[Fnv1a64Expr.hash]] the SQL path calls, so the
  * boundary set is bit-identical by construction (spec-pinned
  * differentially against the retained SQL reference path).
  *
  * Returns [0] ++ boundary positions ++ [numChars]: boundary after char
  * position i (1-based, window ≤ i < numChars) ⇔
  * (fnv1a64(chars [i−window, i)) >>> 11) % divisor == remainder.
  * Callers must pre-filter empty documents (the SQL path's contract). */
case class CdcCutsExpr(child: Expression, window: Int, divisor: Long,
                       remainder: Long) extends UnaryExpression {
  require(window >= 1 && divisor >= 1 && remainder >= 0 && remainder < divisor)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_cuts expects a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else CdcCutsExpr.cuts(v.asInstanceOf[UTF8String], window, divisor, remainder)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcCutsExpr.cuts($c, $window, ${divisor}L, ${remainder}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcCutsExpr {
  /** Referenced from generated code — must stay public. */
  def cuts(text: UTF8String, window: Int, divisor: Long,
           remainder: Long): ArrayData = {
    val n = text.numChars()
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    out += 0L
    var i = window
    while (i < n) {
      val h = Fnv1a64Expr.hash(text.substring(i - window, i))
      if ((h >>> 11) % divisor == remainder) out += i.toLong
      i += 1
    }
    out += n.toLong
    new GenericArrayData(out.toArray)
  }

  def apply(text: Column, window: Int, divisor: Long, remainder: Long): Column =
    GraftExprBridge.column(CdcCutsExpr(
      GraftExprBridge.expression(text), window, divisor, remainder))
}
