package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Position-sorted double sums in one codegen'd pass:
  * `graft_pos_sorted_sums(arr)` over `array<struct<pos, d1, d2, ...>>`
  * (pos integral and UNIQUE within the array, remaining fields double)
  * returns `array<double>` — for each double field, the sum of its
  * values folded left-to-right in ascending-`pos` order.
  *
  * This is the one-pass form of the LM scorers' determinism fold
  * (guide §1.2 per-task work):
  * `aggregate(sort_array(collect_list(struct(pos, lp…))), 0.0,
  * (acc, x) => acc + x.lp)` — sort_array + aggregate evaluate
  * INTERPRETED with a per-element lambda and per-step struct
  * allocation, profiled as a visible slice of lmScore / dsirWeights /
  * perplexityBuckets CPU. Because `pos` is unique (posexplode), sorting
  * by `pos` alone reproduces sort_array's full-struct ordering exactly,
  * and the kernel adds the SAME doubles in the SAME left-to-right order
  * — bit-equal totals by construction (OpsSpec pins kernel == HOF
  * fold). A NULL double anywhere poisons that field's sum to NULL,
  * mirroring `+`'s null propagation in the lambda. NULL input → NULL. */
case class PosSortedSums(child: Expression) extends UnaryExpression {

  private def fieldsOk(st: StructType): Boolean =
    st.fields.length >= 2 &&
      (st.fields.head.dataType == IntegerType || st.fields.head.dataType == LongType) &&
      st.fields.tail.forall(_.dataType == DoubleType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _) if fieldsOk(st) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<pos int/long, double...>>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = PosSortedSums.Name

  private lazy val st = child.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType]
  private lazy val posIsLong = st.fields.head.dataType == LongType
  private lazy val nSums = st.fields.length - 1

  override def nullSafeEval(a: Any): Any =
    PosSortedSums.sums(a.asInstanceOf[ArrayData], nSums, posIsLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PosSortedSums.sums($a, $nSums, $posIsLong);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PosSortedSums {
  val Name = "graft_pos_sorted_sums"

  def sums(arr: ArrayData, nSums: Int, posIsLong: Boolean): ArrayData = {
    val n = arr.numElements()
    val fieldsPerRow = nSums + 1
    // extract (pos, doubles...) into primitive arrays, then sort an index
    // permutation by pos — no boxed structs on the hot path
    val pos = new Array[Long](n)
    val vals = new Array[Double](n * nSums)
    val isNull = new Array[Boolean](n * nSums)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, fieldsPerRow)
      pos(i) = if (posIsLong) row.getLong(0) else row.getInt(0).toLong
      var f = 0
      while (f < nSums) {
        if (row.isNullAt(f + 1)) isNull(i * nSums + f) = true
        else vals(i * nSums + f) = row.getDouble(f + 1)
        f += 1
      }
      i += 1
    }
    val order = (0 until n).toArray
    // stable sort by pos (pos is unique by contract; stability is a
    // belt-and-braces guarantee that ties cannot reorder)
    val boxed = order.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, (x: Integer, y: Integer) =>
      java.lang.Long.compare(pos(x), pos(y)))
    // enforce the uniqueness contract instead of documenting it (ADVICE
    // r15): with duplicate pos the sort_array fold this kernel mirrors
    // would tie-break on the DOUBLE fields, and the two formulations
    // could silently add in different orders — fail loudly instead
    var d = 1
    while (d < n) {
      if (pos(boxed(d - 1).intValue()) == pos(boxed(d).intValue()))
        throw new IllegalArgumentException(
          s"$Name: duplicate pos ${pos(boxed(d).intValue())} — pos must be " +
            "unique within the array (the posexplode contract)")
      d += 1
    }
    val out = new Array[Any](nSums)
    var f = 0
    while (f < nSums) {
      var acc = 0.0
      var nul = false
      var j = 0
      while (j < n && !nul) {
        val k = boxed(j).intValue()
        if (isNull(k * nSums + f)) nul = true
        else acc += vals(k * nSums + f)
        j += 1
      }
      out(f) = if (nul) null else java.lang.Double.valueOf(acc)
      f += 1
    }
    new GenericArrayData(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[PosSortedSums].getName, Name)

  val builder: Seq[Expression] => Expression = {
    case Seq(a) => PosSortedSums(a)
    case other => throw new IllegalArgumentException(
      s"$Name expects one array<struct> argument, got ${other.size} args")
  }
}
