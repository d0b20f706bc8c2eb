package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Coalesce, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-grams of a text column in one codegen'd pass:
  * `graft_word_ngrams(text, k)` — bit-identical to
  * [[graft.ops.TextAnalysis.wordNgrams]]'s zip_with-over-slices
  * formulation (spec- and property-pinned), including its edge quirks:
  * k=1 is the empty-filtered word list; k≥2 keeps the phantom empty
  * tokens Java's split emits around non-space outer whitespace; fewer
  * than k words — and NULL text, which the builder coalesces to "" so
  * the SQL surface honors the wordNgrams contract — yield an empty
  * array.
  *
  * Why a custom expression (SURVEY §7.4): the HOF chain (k−1 zip_with
  * passes + filter) evaluates INTERPRETED with per-element lambda
  * dispatch, and it sits under the widest-fanout operators in the
  * library — LSH shingling, SimHash, decontamination, LM scoring,
  * substring-span dedup, repetition. This kernel splits ONCE with the
  * very same compiled `\s+` pattern Spark's `split` uses (semantics
  * identical by construction, not by reimplementation) and assembles
  * grams with a StringBuilder inside whole-stage codegen. */
case class WordNgrams(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, int literal), got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = WordNgrams.Name

  override def nullSafeEval(t: Any): Any =
    WordNgrams.ngrams(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WordNgrams.ngrams($t, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  val Name = "graft_word_ngrams"

  // the same regex Spark's split(trim(text), "\s+") compiles — splitting
  // through it (limit -1) guarantees token-for-token equality with the
  // SQL formulation, phantom empties included
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def ngrams(s: UTF8String, k: Int): ArrayData = {
    // Spark trim(): strip 0x20 only (other whitespace survives — and
    // with it the phantom-empty-token quirk the HOF formulation has)
    val str = s.toString
    var b = 0
    var e = str.length
    while (b < e && str.charAt(b) == ' ') b += 1
    while (e > b && str.charAt(e - 1) == ' ') e -= 1
    val words = Ws.split(str.substring(b, e), -1)
    if (k == 1) {
      val out = new java.util.ArrayList[AnyRef](words.length)
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty) out.add(UTF8String.fromString(words(i)))
        i += 1
      }
      new GenericArrayData(out.toArray)
    } else {
      val m = words.length - k + 1
      if (m <= 0) new GenericArrayData(Array.empty[Any])
      else {
        val out = new Array[Any](m)
        var i = 0
        while (i < m) {
          val sb = new java.lang.StringBuilder()
          var j = 0
          while (j < k) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j))
            j += 1
          }
          out(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        new GenericArrayData(out)
      }
    }
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[WordNgrams].getName, Name)

  val builder: Seq[Expression] => Expression = {
    case Seq(t, ke) if ke.foldable && ke.dataType == IntegerType =>
      val k = Option(ke.eval()).map(_.asInstanceOf[Int]).getOrElse(
        throw new IllegalArgumentException(s"$Name: k literal is NULL"))
      require(k >= 1, s"$Name: k must be >= 1: $k")
      // NULL text behaves as "" (→ empty gram array) at the SQL surface
      // too, matching the wordNgrams contract — not a NULL result
      WordNgrams(Coalesce(Seq(t, Literal(UTF8String.fromString(""), StringType))), k)
    case other => throw new IllegalArgumentException(
      s"$Name expects (text, k int literal), got " +
        other.map(_.dataType.simpleString).mkString(", "))
  }
}
