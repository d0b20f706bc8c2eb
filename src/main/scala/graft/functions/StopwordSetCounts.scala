package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence counts of a token array against N plan-literal word sets in
  * ONE pass: `graft_stopword_counts(tokens, 'the,a,of|el,la,de|...')` →
  * `array<long>` of per-set counts (duplicates counted, like
  * `size(filter(tokens, array_contains(set, _)))`).
  *
  * Why a custom expression (SURVEY §7.4): language-ID and quality scoring
  * evaluate one interpreted higher-order `filter` PER SET per row — four
  * lambda-dispatched array walks on the hottest corpus path (the curation
  * gate). This kernel walks the array once with a single hash probe per
  * token (word → set-membership bitmask, compiled from the literal at
  * plan time) inside whole-stage codegen. Same counts, bit-for-bit —
  * pinned against the HOF formulation in the spec. */
case class StopwordSetCounts(child: Expression, sets: StopwordSetCounts.Sets)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = StopwordSetCounts.Name

  override def nullSafeEval(v: Any): Any =
    sets.count(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftStopwordSets", sets,
      classOf[StopwordSetCounts.Sets].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StopwordSetCounts {
  val Name = "graft_stopword_counts"

  /** Word → set-membership bitmask, compiled once at plan time from the
    * literal. ≤ 32 sets (an Int bitmask — far beyond any stopword use). */
  final class Sets(groups: Seq[Seq[String]]) extends Serializable {
    require(groups.nonEmpty && groups.size <= 32,
      s"$Name: need 1..32 word sets, got ${groups.size}")
    private val n = groups.size
    private val masks = {
      val m = new java.util.HashMap[UTF8String, Integer]()
      groups.zipWithIndex.foreach { case (ws, i) =>
        ws.foreach { w =>
          m.merge(UTF8String.fromString(w), Integer.valueOf(1 << i),
            (a, b) => Integer.valueOf(a.intValue | b.intValue))
        }
      }
      m
    }
    def count(arr: ArrayData): ArrayData = {
      val out = new Array[Long](n)
      var i = 0
      val len = arr.numElements()
      while (i < len) {
        if (!arr.isNullAt(i)) {
          val m = masks.get(arr.getUTF8String(i))
          if (m != null) {
            var b = m.intValue
            while (b != 0) {
              out(java.lang.Integer.numberOfTrailingZeros(b)) += 1
              b &= b - 1
            }
          }
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** `'the,a|el,la'` → Sets; the serialization [[graft.ops.TextAnalysis]]
    * uses ('|' between sets, ',' between words — neither occurs in
    * whitespace-tokenized words). Limit -1 keeps trailing EMPTY sets —
    * a discarded group would silently shift every later set's index. */
  def parse(literal: String): Sets =
    new Sets(literal.split("\\|", -1).toSeq.map(_.split(',').toSeq.filter(_.nonEmpty)))

  val info: ExpressionInfo = new ExpressionInfo(classOf[StopwordSetCounts].getName, Name)

  val builder: Seq[Expression] => Expression = {
    case Seq(c, l) if l.foldable && l.dataType == StringType =>
      val lit = Option(l.eval()).map(_.toString).getOrElse(
        throw new IllegalArgumentException(s"$Name: sets literal is NULL"))
      StopwordSetCounts(c, parse(lit))
    case other => throw new IllegalArgumentException(
      s"$Name expects (array<string>, sets literal), got " +
        other.map(_.dataType.simpleString).mkString(", "))
  }
}
