package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over a hashed shingle set as a native Catalyst
  * expression — the codegen'd form of [[Hashes.minHashSignatureFromHashes]]
  * (same permutation family, bit-identical output). The UDF it replaces
  * crossed the encoder boundary with a boxed `Seq[Long]` on BOTH sides —
  * one object per shingle hash in, one per signature slot out, on the
  * hottest signature path (every MinHash dedup corpus pass). Here the
  * input is read with `toLongArray` (primitive copy) and the k×n
  * multiply-shift loop runs on primitives end to end.
  *
  * Null input signs the empty set (all sentinel values) — the UDF's
  * behavior, which keeps downstream banding total. Composes with
  * [[ShingleHashesExpr]]: `MinHashSigExpr(ShingleHashesExpr(text, n), k)`
  * is the fully native text→signature pass (signature min is duplicate-
  * and order-invariant, so signing the sorted distinct hash set equals
  * signing the raw shingle stream). */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"signature length must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinHashSigExpr.sig(null, k)
    else MinHashSigExpr.sig(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cls = "graft.functions.MinHashSigExpr"
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${c.code}
      $javaType ${ev.value} = $cls.sig(${c.isNull} ? null : ${c.value}, $k);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  /** Referenced from generated code — must stay public and static-shaped. */
  def sig(arr: ArrayData, k: Int): ArrayData = {
    val hs = if (arr == null) Array.emptyLongArray else arr.toLongArray()
    UnsafeArrayData.fromPrimitiveArray(Hashes.minHashSignatureFromHashes(hs, k))
  }

  /** Column-level constructor. */
  def apply(c: Column, k: Int): Column =
    GraftExprBridge.column(MinHashSigExpr(GraftExprBridge.expression(c), k))
}
