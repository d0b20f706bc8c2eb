package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column (canonical composition:
  * "e" + U+0301 combining acute → "é") — the first step of training-corpus
  * text normalization, where the same visible text must hash/dedup/shingle
  * identically regardless of which Unicode form the crawler emitted.
  *
  * Spark has no built-in normalizer, and the JVM's `java.text.Normalizer`
  * is the public platform implementation — so this is the canonical
  * custom-expression case (SURVEY §7.4): a thin codegen'd wrapper keeping
  * normalization inside whole-stage codegen instead of a boxed Scala UDF.
  * The ASCII fast path ([[NfcNormalize.nfc]]: `isNormalized` check before
  * allocating) matters because real corpora are dominated by
  * already-normalized text — the common row costs one scan, no copy.
  *
  * The DuckDB oracle twin is `nfc_normalize(...)`; both engines implement
  * the same Unicode canonical composition, so outputs are byte-identical.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = NfcNormalize.Name

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  val Name = "graft_nfc"

  /** Static kernel shared by interpreted eval and codegen. Already-NFC
    * input (the overwhelmingly common case — all of ASCII) returns the
    * SAME UTF8String, no string materialization. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[NfcNormalize].getName, Name)

  val builder: Seq[Expression] => Expression = {
    case Seq(c) => NfcNormalize(c)
    case other => throw new IllegalArgumentException(
      s"$Name expects 1 argument, got ${other.size}")
  }
}
