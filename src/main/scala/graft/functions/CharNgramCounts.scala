package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Coalesce, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character-n-gram COUNTS in one codegen'd pass:
  * `graft_char_ngram_counts(text, n)` →
  * `array<struct<gram: string, cnt: long>>`, one entry per DISTINCT gram
  * in first-occurrence order, `cnt` = its occurrence count in this row.
  *
  * This is the in-row ("ultimate map-side", guide §2.3 aggregate before
  * you shuffle) form of `explode(graft_char_ngrams(t, n)) → groupBy →
  * count`: the trained language-ID / quality scorers
  * ([[graft.ops.TextAnalysis.langIdModelTrain]]/`modelScore`) previously
  * pushed every gram OCCURRENCE (corpus chars × gram sizes rows) through
  * a hash aggregate to get per-(doc, gram) counts — profiled as the
  * dominant CPU of both model entries. Counting inside the row needs no
  * aggregate at all on the scoring side and shrinks the training
  * aggregate's input to distinct-grams-per-doc. By construction
  * `explode` of this result replayed as `Σ cnt` equals the old
  * occurrence count exactly (same gram walk as [[CharNgrams.ngrams]] —
  * code-point boundaries, surrogate pairs one char); OpsSpec pins the
  * equality. */
case class CharNgramCounts(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, int literal), got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("gram", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = CharNgramCounts.Name

  override def nullSafeEval(t: Any): Any =
    CharNgramCounts.counts(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CharNgramCounts.counts($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgramCounts {
  val Name = "graft_char_ngram_counts"

  def counts(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    // same code-point boundary walk as CharNgrams.ngrams (bit-equal gram
    // set is the whole contract)
    val bounds = new Array[Int](str.length + 1)
    var cp = 0
    var i = 0
    while (i < str.length) {
      bounds(cp) = i
      cp += 1
      i += Character.charCount(str.codePointAt(i))
    }
    bounds(cp) = str.length
    val m = cp - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // LinkedHashMap: deterministic first-occurrence output order (the
    // consumer aggregates/joins, so order is immaterial — but determinism
    // keeps plans replayable); String keys hash/compare cheaply
    val acc = new java.util.LinkedHashMap[String, Array[Long]](m * 2)
    var j = 0
    while (j < m) {
      val g = str.substring(bounds(j), bounds(j + n))
      val c = acc.get(g)
      if (c == null) acc.put(g, Array(1L)) else c(0) += 1L
      j += 1
    }
    val out = new Array[Any](acc.size)
    val it = acc.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(UTF8String.fromString(e.getKey), e.getValue()(0))
      k += 1
    }
    new GenericArrayData(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[CharNgramCounts].getName, Name)

  val builder: Seq[Expression] => Expression = {
    case Seq(t, ne) if ne.foldable && ne.dataType == IntegerType =>
      val n = Option(ne.eval()).map(_.asInstanceOf[Int]).getOrElse(
        throw new IllegalArgumentException(s"$Name: n literal is NULL"))
      require(n >= 1, s"$Name: n must be >= 1: $n")
      // NULL text → empty counts (the CharNgrams rule)
      CharNgramCounts(Coalesce(Seq(t, Literal(UTF8String.fromString(""), StringType))), n)
    case other => throw new IllegalArgumentException(
      s"$Name expects (text, n int literal), got " +
        other.map(_.dataType.simpleString).mkString(", "))
  }
}
