package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the native Catalyst expressions — the
  * `SparkSessionExtensions` integration point (the Spark analogue of the
  * reference's function-catalog registration: flink-libraries/flink-table/
  * .../validate/FunctionCatalog.scala, where built-ins and user functions
  * share one SQL namespace).
  *
  * Two entry forms, same registry rows:
  *  - config path: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    injects at session build — the deployment form;
  *  - runtime path: `GraftExtensions.register(spark)` on a live session —
  *    the form the driver-owned sessions in this project can use.
  *
  * After either, SQL text can call `fnv1a64(str)` and
  * `cosine_similarity(array<float>, array<float>)` — both native codegen
  * expressions, not UDFs, so SQL-text queries get the same fused loops as
  * the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {

  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def one(args: Seq[Expression], name: String): Expression = {
    require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
    args.head
  }

  val descriptors: Seq[Descriptor] = Seq(
    (FunctionIdentifier("fnv1a64"),
      new ExpressionInfo(classOf[Fnv1a64Expr].getName, "fnv1a64"),
      (args: Seq[Expression]) => Fnv1a64Expr(one(args, "fnv1a64"))),
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"cosine_similarity expects 2 arguments, got ${args.length}")
        CosineSimilarityExpr(args(0), args(1))
      }))

  /** Register on a live session (idempotent — re-registration overwrites
    * with identical rows). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
