package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy WordPiece longest-match-first encode of ONE word against a
  * TRIE-compiled piece vocabulary — the vocabulary-scale form of
  * `TextPipeline.wordpieceEncode`'s inline-literal fold (same algorithm:
  * Devlin et al. 2019; reference anchor: the scalar-function codegen
  * surface of SURVEY §2.9).
  *
  * The inline fold scans the whole vocabulary literal at every cursor
  * position — O(positions · |vocab|) with the vocabulary re-parsed into
  * the expression tree (six copies). Measured at BERT-scale 30k pieces
  * (IterBench `wpencode`, sf0.1 pseudo-corpus): the inline plan costs
  * ~6 s of parse/analyze/codegen alone (a megabyte of SQL text) and runs
  * ~2.5× slower warm; Spark's array/map literals are array-backed, so
  * even `element_at` lookups would stay O(|vocab|). Here the vocabulary
  * compiles ONCE on the driver into two code-point tries (word-initial
  * pieces; `##`-continuation pieces), ships with the serialized plan as
  * a reference object, and each cursor position walks the trie —
  * O(longest-piece) per position, |vocab|-independent (measured flat
  * 100 → 30k pieces).
  *
  * Emits struct(w_toks long, unk boolean) with the whole-word-UNK
  * contract of the inline version: any cursor position matching no piece
  * makes the word a single UNK token. Null input → null. Codegen calls
  * the trie through a plan reference, keeping the surrounding pipeline
  * in whole-stage codegen. */
case class WordpieceEncodeExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  require(vocab.nonEmpty, "vocab must not be empty")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode expects a string input, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("w_toks", LongType, nullable = false),
    StructField("unk", BooleanType, nullable = false)))

  @transient private lazy val trie = WordpieceTrie.build(vocab)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else trie.encode(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val trieRef = ctx.addReferenceObj("wordpieceTrie", trie,
      classOf[WordpieceTrie].getName)
    val javaType = CodeGenerator.javaType(dataType)
    if (nullable) {
      ev.copy(code = code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        $javaType ${ev.value} = ${ev.isNull} ? null : $trieRef.encode(${c.value});
      """)
    } else {
      ev.copy(code = code"""
        ${c.code}
        $javaType ${ev.value} = $trieRef.encode(${c.value});
      """, isNull = FalseLiteral)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Code-point trie pair for greedy WordPiece matching. Built once on the
  * driver, serialized with the plan. Positions step by CODE POINT to match
  * the inline fold's `substring` semantics on non-BMP text. */
final class WordpieceTrie private (
    initChildren: Array[java.util.HashMap[Integer, Integer]],
    initPiece: Array[Boolean],
    contChildren: Array[java.util.HashMap[Integer, Integer]],
    contPiece: Array[Boolean]) extends Serializable {

  /** Referenced from generated code — must stay public. */
  def encode(word: UTF8String): InternalRow = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    var pos = 0
    var toks = 0L
    while (pos < n) {
      val (children, piece) =
        if (pos == 0) (initChildren, initPiece) else (contChildren, contPiece)
      var node = 0
      var i = pos
      var longest = -1
      var live = true
      while (live && i < n) {
        val next = children(node).get(cps(i))
        if (next == null) live = false
        else {
          node = next
          i += 1
          if (piece(node)) longest = i
        }
      }
      if (longest < 0) return InternalRow(1L, true) // whole word is one UNK
      toks += 1L
      pos = longest
    }
    InternalRow(toks, false)
  }
}

object WordpieceTrie {
  private final class Builder {
    val children = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Integer, Integer]())
    val piece = scala.collection.mutable.ArrayBuffer(false)
    def insert(s: String): Unit = {
      var node = 0
      s.codePoints().forEach { cp =>
        val next = children(node).get(cp)
        node = if (next != null) next.intValue()
        else {
          children += new java.util.HashMap[Integer, Integer]()
          piece += false
          children(node).put(cp, children.size - 1)
          children.size - 1
        }
      }
      piece(node) = true
    }
    def freeze: (Array[java.util.HashMap[Integer, Integer]], Array[Boolean]) =
      (children.toArray, piece.toArray)
  }

  def build(vocab: Seq[String]): WordpieceTrie = {
    val init = new Builder
    val cont = new Builder
    vocab.foreach { p =>
      if (p.startsWith("##")) {
        val s = p.stripPrefix("##")
        require(s.nonEmpty, "continuation piece must be non-empty after ##")
        cont.insert(s)
      } else {
        require(p.nonEmpty, "piece must be non-empty")
        init.insert(p)
      }
    }
    val (ic, ip) = init.freeze
    val (cc, cp) = cont.freeze
    new WordpieceTrie(ic, ip, cc, cp)
  }
}
