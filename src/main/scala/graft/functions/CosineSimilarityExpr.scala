package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns — the preferred extension form for hot scalar
  * kernels (capability analogue of the reference's code-generated scalar
  * calls: flink-libraries/flink-table/.../codegen/CodeGenerator.scala +
  * CosineDistanceMetric.scala in FlinkML): `doGenCode` emits a fused
  * primitive loop directly into whole-stage codegen, so the similarity
  * join stays inside one generated function with no UDF serialization
  * boundary.
  *
  * Accumulation order matches VectorFunctions.cosineSimilarity(Fast):
  * left-to-right dot product, then norms — bit-identical results across
  * all three forms.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) { ab += x(i).toDouble * y(i).toDouble; i += 1 }
    i = 0
    while (i < x.length) { val v = x(i).toDouble; aa += v * v; i += 1 }
    i = 0
    while (i < y.length) { val v = y(i).toDouble; bb += v * v; i += 1 }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val v = ctx.freshName("v")
      s"""
        float[] $x = $a.toFloatArray();
        float[] $y = $b.toFloatArray();
        int $n = Math.min($x.length, $y.length);
        double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
        for (int $i = 0; $i < $n; $i++) { $ab += (double) $x[$i] * (double) $y[$i]; }
        for (int $i = 0; $i < $x.length; $i++) { double $v = (double) $x[$i]; $aa += $v * $v; }
        for (int $i = 0; $i < $y.length; $i++) { double $v = (double) $y[$i]; $bb += $v * $v; }
        ${ev.value} = $ab / (Math.sqrt($aa) * Math.sqrt($bb));
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {
  /** Column-level constructor. */
  def apply(a: Column, b: Column): Column =
    GraftExprBridge.column(CosineSimilarityExpr(
      GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
}
