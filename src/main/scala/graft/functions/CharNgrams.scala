package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Coalesce, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping character n-grams by CODE POINT in one codegen'd pass:
  * `graft_char_ngrams(text, n)` — bit-identical to the
  * [[graft.ops.TextAnalysis.charBigramsFrom]] zip_with-over-slices
  * formulation over [[graft.ops.TextAnalysis.chars]] (spec-pinned): a
  * surrogate PAIR counts as one character (so CJK/emoji gram correctly),
  * a lone unpaired surrogate counts as one the way the regex `.` the HOF
  * path uses matches it, and texts shorter than n code points yield an
  * empty array.
  *
  * Why a custom expression (SURVEY §7.4): the HOF path runs a full-text
  * regex extraction into a per-character array, two slice copies and an
  * interpreted per-element zip_with — under the trained language-ID
  * model ([[graft.ops.TextAnalysis.langIdModelTrain]]/`Score`) that is
  * the per-row hot path over the whole corpus. This kernel walks the
  * string once with `codePointAt` inside whole-stage codegen. */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, int literal), got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = CharNgrams.Name

  override def nullSafeEval(t: Any): Any =
    CharNgrams.ngrams(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CharNgrams.ngrams($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgrams {
  val Name = "graft_char_ngrams"

  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    // code-point boundaries (code-UNIT offsets) in one primitive int
    // array — this is the per-row hot path, no boxed Integers. At most
    // length+1 boundaries; bounds(i) = start of the i-th code point,
    // bounds(cp) = str.length
    val bounds = new Array[Int](str.length + 1)
    var cp = 0
    var i = 0
    while (i < str.length) {
      bounds(cp) = i
      cp += 1
      i += Character.charCount(str.codePointAt(i))
    }
    bounds(cp) = str.length
    val m = cp - n + 1 // #code-points − n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m)
      var j = 0
      while (j < m) {
        out(j) = UTF8String.fromString(str.substring(bounds(j), bounds(j + n)))
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[CharNgrams].getName, Name)

  val builder: Seq[Expression] => Expression = {
    case Seq(t, ne) if ne.foldable && ne.dataType == IntegerType =>
      val n = Option(ne.eval()).map(_.asInstanceOf[Int]).getOrElse(
        throw new IllegalArgumentException(s"$Name: n literal is NULL"))
      require(n >= 1, s"$Name: n must be >= 1: $n")
      // NULL text → empty gram array at the SQL surface (the langid model
      // explodes the result, where NULL and empty are equivalent anyway)
      CharNgrams(Coalesce(Seq(t, Literal(UTF8String.fromString(""), StringType))), n)
    case other => throw new IllegalArgumentException(
      s"$Name expects (text, n int literal), got " +
        other.map(_.dataType.simpleString).mkString(", "))
  }
}
