package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash over a token-array column as a native Catalyst
  * expression — the codegen'd form of [[Hashes.simHash64]] (same FNV-1a
  * per token, same ±1 vote per bit, same sign→bit fold; bit-identical
  * output, spec-pinned). The UDF it replaces crossed the encoder boundary
  * with a boxed `Seq[String]` — one String copy per token on every
  * signature pass — and broke whole-stage codegen at the hottest point of
  * the SimHash dedup family (q86 signatures, [[graft.operators
  * .SimHashIndex]] ingest/probe, [[graft.operators.Dedup.simhashPairs]]).
  * Here tokens are read as UTF8String and hashed over their UTF-8 bytes
  * directly ([[Fnv1a64Expr.hash]], byte-identical to the UDF's
  * `getBytes("UTF-8")` path), primitives end to end.
  *
  * Null input and the empty array both sign 0L (the UDF's behavior —
  * keeps downstream Hamming banding total). Null and EMPTY elements are
  * skipped inside the kernel, so `SimHashExpr(split(text, "\\s+"))` ≡
  * `simHash64(tokens(text))` — callers feed the raw `split` and drop the
  * `filter(_ =!= "")` wrapper, whose ArrayFilter higher-order function is
  * CodegenFallback and would otherwise evict the whole projection from
  * the WholeStageCodegen span (spec-pinned both ways). */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<string> input, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SimHashExpr.sim(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} = ${c.isNull} ? 0L : graft.functions.SimHashExpr.sim(${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpr {
  /** Referenced from generated code — must stay public and static-shaped. */
  def sim(arr: ArrayData): Long = {
    val n = if (arr == null) 0 else arr.numElements()
    if (n == 0) return 0L
    val acc = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.numBytes() > 0) { // empty tokens skipped: split-only inputs
          val h = Fnv1a64Expr.hash(t)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-level constructor. */
  def apply(c: Column): Column =
    GraftExprBridge.column(SimHashExpr(GraftExprBridge.expression(c)))
}
