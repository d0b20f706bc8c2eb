package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Σ aᵢ·bᵢ over two `array<float>` columns, accumulated in double.
  *
  * Why a custom Catalyst expression (SURVEY §7.4 custom-vs-built-in): the
  * composable alternative — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * uses higher-order functions, which Spark evaluates INTERPRETED (no
  * whole-stage codegen) with per-element lambda dispatch and boxing. This
  * expression generates a tight primitive loop via `doGenCode`, keeping
  * similarity-search scans inside codegen. Summation order (left-to-right,
  * double accumulator) matches the fold exactly, so results are
  * bit-identical to the HOF formulation on equal-length arrays.
  */
case class VecDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"

  // length mismatch → NULL, matching the HOF formulation (zip_with pads
  // the shorter side with nulls, which poison the sum) — a silent
  // common-prefix dot product would rank plausible-but-wrong neighbors
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDotProduct {
  val Name = "graft_vec_dot"

  val info: ExpressionInfo = new ExpressionInfo(classOf[VecDotProduct].getName, Name)

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => VecDotProduct(a, b)
    case other => throw new IllegalArgumentException(
      s"$Name expects 2 arguments, got ${other.size}")
  }
}
