package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level tokenizer alphabet remap — the byte→printable-unit
  * bijection under byte-level BPE (GPT-2 / RoBERTa / GPT-3 family:
  * Radford et al. 2019 encode text as UTF-8 bytes and map every byte to
  * a visible character so the BPE table never meets raw control bytes
  * and NEVER produces an unknown token — 256 units cover everything).
  *
  * GPT-2's published table maps bytes into mixed-case Latin pages; this
  * engine's BPE family is lowercase-normalized (tokens(lower(text))
  * everywhere), and case-folding that table ALIASES distinct bytes
  * (lower('Ġ'=U+0120, byte 32) = 'ġ'=U+0121 = byte 127's unit; UTF-8
  * lead byte 0xC3's unit 'Ã' folds onto byte 0xE3's 'ã'). So the unit
  * page here is the CASELESS Braille block instead: byte b → U+2800+b,
  * bijective, printable, fixed under any engine's lower(). The
  * byte-level property BPE needs — a stable bijection byte ↔ unit —
  * is exactly preserved; only the cosmetic choice of page differs, and
  * an external engine replays it as chr(10240 + byte).
  *
  * Output length = UTF-8 byte count of the input (each unit is one BMP
  * char, 3 UTF-8 bytes on the wire). Null in → null out; "" → "". */
case class ByteUnitsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_units expects a string input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    ByteUnitsExpr.remap(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteUnitsExpr.remap($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteUnitsExpr {
  /** Referenced from generated code — must stay public and static-shaped. */
  def remap(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append((0x2800 + (bytes(i) & 0xff)).toChar)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def apply(c: Column): Column =
    GraftExprBridge.column(ByteUnitsExpr(GraftExprBridge.expression(c)))
}
