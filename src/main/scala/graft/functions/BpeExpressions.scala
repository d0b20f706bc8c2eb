package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static-call surface for the BPE expressions' generated code (object
  * methods compile to static forwarders — the [[SrpPlanes]] pattern). */
object BpeOps {
  def count(s: UTF8String): Long = Bpe.Default.count(s.toString)
  def tokens(s: UTF8String): ArrayData = {
    val t = Bpe.Default.encode(s.toString)
    val out = new Array[AnyRef](t.length)
    var i = 0
    while (i < t.length) { out(i) = UTF8String.fromString(t(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** Real-BPE token count of a string column ([[Bpe]]) — codegen'd scalar,
  * shuffle-free, evaluated at scan speed; the tight merge loop lives in
  * library code behind one static call. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = BpeTokenCount.Name

  override def nullSafeEval(v: Any): Any =
    BpeOps.count(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeOps.count($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCount {
  val Name = "graft_bpe_count"
  val info: ExpressionInfo = new ExpressionInfo(classOf[BpeTokenCount].getName, Name)
  val builder: Seq[Expression] => Expression = {
    case Seq(c) => BpeTokenCount(c)
    case other => throw new IllegalArgumentException(
      s"$Name expects (text), got ${other.size} args")
  }
}

/** Real-BPE token ARRAY of a string column — tokens concatenate back to
  * the exact input (the pre-tokenizer partitions it), which is what lets
  * chunk windows over BPE tokens reconstruct text ([[graft.ops.Corpus]]). */
case class BpeTokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = BpeTokens.Name

  override def nullSafeEval(v: Any): Any =
    BpeOps.tokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeOps.tokens($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokens {
  val Name = "graft_bpe_tokens"
  val info: ExpressionInfo = new ExpressionInfo(classOf[BpeTokens].getName, Name)
  val builder: Seq[Expression] => Expression = {
    case Seq(c) => BpeTokens(c)
    case other => throw new IllegalArgumentException(
      s"$Name expects (text), got ${other.size} args")
  }
}

/** [[BpeTokenCount]] under a CALLER-SUPPLIED merge table — how a table
  * learned by [[Bpe.train]] (or any standard merges.txt) is applied at
  * scan speed. The merges arrive as a foldable newline-joined string of
  * byte-level merges.txt lines (the [[SeededXxHash64Long]] pattern: a
  * literal that parameterizes the plan, not data); the builder compiles
  * it to a [[Bpe.Vocab]] ONCE at plan time, and generated code reaches
  * the vocab through a plan reference object — per-row work is the same
  * merge loop as the default-table expression. */
case class BpeTokenCountVocab(child: Expression, vocab: Bpe.Vocab)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = BpeTokenCountVocab.Name

  override def nullSafeEval(v: Any): Any =
    vocab.count(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBpeVocab", vocab, classOf[Bpe.Vocab].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCountVocab {
  val Name = "graft_bpe_count_vocab"
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[BpeTokenCountVocab].getName, Name)
  val builder: Seq[Expression] => Expression = {
    case Seq(c, m) if m.foldable && m.dataType == StringType =>
      val lines = Option(m.eval()).map(_.toString).getOrElse(
        throw new IllegalArgumentException(s"$Name: merges literal is NULL"))
      BpeTokenCountVocab(c, Bpe.vocab(lines.split('\n').toSeq))
    case other => throw new IllegalArgumentException(
      s"$Name expects (text, mergesLines literal), got " +
        other.map(_.dataType.simpleString).mkString(", "))
  }
}
