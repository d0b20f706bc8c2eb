package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Asymmetric-distance computation (ADC) for product quantization:
  * `Σ_m lut[m·ksub + codes[m]]` — the inner loop of a PQ probe scan
  * (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
  * Search"). `codes` is a vector's M sub-quantizer code ids; `lut` is
  * the query's precomputed M×ksub table of sub-space partial dot
  * products, flattened row-major by (sub, code).
  *
  * Why a custom Catalyst expression (SURVEY §7.4): the composable
  * alternative — `aggregate(transform(codes, (c, m) -> element_at(lut,
  * m*ksub + c + 1)), 0d, _+_)` — evaluates INTERPRETED (higher-order
  * functions don't codegen) with per-element boxing, in the hottest loop
  * of the scan (runs once per probed candidate per query). This
  * generates a tight primitive loop. NULL on an out-of-range code or a
  * lut whose length isn't a multiple of ksub — a silent partial sum
  * would rank plausible-but-wrong neighbors (the [[VecDotProduct]]
  * length-mismatch discipline).
  */
case class PqAdc(codes: Expression, lut: Expression, ksub: Expression)
    extends TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = lut
  override def third: Expression = ksub

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (codes.dataType, lut.dataType, ksub.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _), IntegerType) => true
      case _ => false
    }
    if (ok && ksub.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<int>, array<double>, int literal), got " +
        s"(${codes.dataType.simpleString}, ${lut.dataType.simpleString}, " +
        s"${ksub.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"
  override def nullable: Boolean = true

  override def nullSafeEval(c: Any, l: Any, k: Any): Any = {
    val cs = c.asInstanceOf[ArrayData]
    val lu = l.asInstanceOf[ArrayData]
    val ks = k.asInstanceOf[Int]
    val m = cs.numElements()
    if (ks <= 0 || lu.numElements() != m * ks) return null
    var s = 0.0
    var i = 0
    while (i < m) {
      // a NULL slot would read as getInt == 0 — lut[sub*ksub] summed
      // silently, the partial-sum hazard the contract forbids
      if (cs.isNullAt(i)) return null
      val code = cs.getInt(i)
      if (code < 0 || code >= ks) return null
      s += lu.getDouble(i * ks + code)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l, k) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val code = ctx.freshName("code")
      val m = ctx.freshName("m")
      s"""
         |int $m = $c.numElements();
         |if ($k <= 0 || $l.numElements() != $m * $k) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $m && !${ev.isNull}; $i++) {
         |    if ($c.isNullAt($i)) { ${ev.isNull} = true; }
         |    else {
         |      int $code = $c.getInt($i);
         |      if ($code < 0 || $code >= $k) { ${ev.isNull} = true; }
         |      else { $s += $l.getDouble($i * $k + $code); }
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(codes = newFirst, lut = newSecond, ksub = newThird)
}

object PqAdc {
  val Name = "graft_pq_adc"

  val info: ExpressionInfo = new ExpressionInfo(classOf[PqAdc].getName, Name)

  val builder: Seq[Expression] => Expression = {
    case Seq(c, l, k) => PqAdc(c, l, k)
    case other => throw new IllegalArgumentException(
      s"$Name expects 3 arguments, got ${other.size}")
  }
}
