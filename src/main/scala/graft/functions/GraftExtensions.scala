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
  * After either, SQL text can call `fnv1a64(str)`,
  * `cosine_similarity(array<float>, array<float>)`,
  * `shingle_hashes(str, n)`, `pos_shingle_hashes(str, n)`,
  * `minhash_sig(array<bigint>, k)`, and
  * `wordpiece_encode(str, array<string>)` — all native codegen
  * expressions, not UDFs, so SQL-text queries get the same fused loops as
  * the Column API. Shape parameters (`n`, `k`, the wordpiece vocabulary)
  * must be FOLDABLE literals — they are compiled into the expression
  * (loop bounds, the driver-built trie), exactly like the Scala
  * constructors take them as plain values; the vocabulary's array-literal
  * form is the SQL story for `wordpiece_encode` (the trie ships with the
  * serialized plan either way, so 30k-piece vocabularies cost the same as
  * from Scala — see WordpieceEncodeExpr's scale notes).
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

  private def two(args: Seq[Expression], name: String): (Expression, Expression) = {
    require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
    (args(0), args(1))
  }

  /** Shape parameters compile into the expression (loop bounds / the
    * driver-built trie), so their SQL form must be a foldable literal —
    * the registry-time analogue of the Scala constructors' plain-value
    * parameters. */
  private def litInt(e: Expression, fn: String, arg: String): Int = {
    require(e.foldable, s"$fn's $arg argument must be an integer literal")
    e.eval() match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long =>
        // fail fast instead of Long.toInt truncation (4294967296 -> 0)
        if (l.longValue < Int.MinValue || l.longValue > Int.MaxValue)
          throw new IllegalArgumentException(
            s"$fn's $arg argument $l is out of Int range")
        l.intValue
      case s: java.lang.Short => s.intValue
      case b: java.lang.Byte => b.intValue
      case other => throw new IllegalArgumentException(
        s"$fn's $arg argument must be an integer literal, got $other")
    }
  }

  private def litStrings(e: Expression, fn: String, arg: String): Seq[String] = {
    require(e.foldable, s"$fn's $arg argument must be an array<string> literal")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      case other => throw new IllegalArgumentException(
        s"$fn's $arg argument must be an array<string> literal, got $other")
    }
  }

  val descriptors: Seq[Descriptor] = Seq(
    (FunctionIdentifier("fnv1a64"),
      new ExpressionInfo(classOf[Fnv1a64Expr].getName, "fnv1a64"),
      (args: Seq[Expression]) => Fnv1a64Expr(one(args, "fnv1a64"))),
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        val (a, b) = two(args, "cosine_similarity")
        CosineSimilarityExpr(a, b)
      }),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "shingle_hashes"),
      (args: Seq[Expression]) => {
        val (text, n) = two(args, "shingle_hashes")
        ShingleHashesExpr(text, litInt(n, "shingle_hashes", "n"))
      }),
    (FunctionIdentifier("pos_shingle_hashes"),
      new ExpressionInfo(classOf[PosShingleHashesExpr].getName, "pos_shingle_hashes"),
      (args: Seq[Expression]) => {
        val (text, n) = two(args, "pos_shingle_hashes")
        PosShingleHashesExpr(text, litInt(n, "pos_shingle_hashes", "n"))
      }),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        val (hashes, k) = two(args, "minhash_sig")
        MinHashSigExpr(hashes, litInt(k, "minhash_sig", "k"))
      }),
    (FunctionIdentifier("wordpiece_encode"),
      new ExpressionInfo(classOf[WordpieceEncodeExpr].getName, "wordpiece_encode"),
      (args: Seq[Expression]) => {
        val (word, vocab) = two(args, "wordpiece_encode")
        WordpieceEncodeExpr(word, litStrings(vocab, "wordpiece_encode", "vocab"))
      }),
    (FunctionIdentifier("periodic_trim"),
      new ExpressionInfo(classOf[PeriodicTrimExpr].getName, "periodic_trim"),
      (args: Seq[Expression]) => {
        val (text, k) = two(args, "periodic_trim")
        PeriodicTrimExpr(text, litInt(k, "periodic_trim", "k"))
      }))

  /** Register on a live session (idempotent — re-registration overwrites
    * with identical rows). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
