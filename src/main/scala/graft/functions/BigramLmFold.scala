package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole add-k bigram-LM document score in one codegen'd pass:
  * `graft_bigram_lm_fold(grams, bigKeys, bigCnts, uniKeys, uniCnts, addK)`
  * → `struct<n_bigrams: long, total: double>` where `total` is the
  * left-to-right (array-order) sum of
  * `ln((c12 + k) / (c1 + k·V))` over the doc's bigram array, `c12` the
  * bigram's count in `bigKeys/bigCnts`, `c1` the count of the bigram's
  * first token in `uniKeys/uniCnts`, and `V = |uniKeys|` the train vocab
  * size; missing keys count 0. `total` is NULL when the doc has no
  * bigrams (`n_bigrams` 0) — the row the join formulation never produced.
  *
  * This is [[graft.ops.TextAnalysis.lmScore]]'s per-position pipeline
  * (posexplode → count-table joins → `addKLogProb` → pos-sorted fold)
  * collapsed into the row (guide §2.4 remove shuffles): the position
  * stream never leaves its document, so the per-doc fold needs no
  * doc-keyed exchange and no collect_list. Bit-parity by construction:
  * the array IS pos order (posexplode enumerates it), each position's
  * log-probability is the same IEEE expression tree
  * (`(double)c12 + k) / ((double)c1 + k·(double)V)` then `Math.log` —
  * exactly what Catalyst generated for `addKLogProb`), and the adds run
  * left-to-right like the pos-sorted kernel fold. Key arrays must be
  * sorted in Spark's UTF8_BINARY string order (what
  * `sort_array(collect_list(struct(key, cnt)))` yields for unique keys);
  * the lookup is a binary search under `UTF8String.compareTo`, the same
  * comparator.
  *
  * Memory contract: the model arrays are the vocab-bounded count tables
  * the join formulation already broadcast — one copy per executor via
  * the 1-row broadcast cross-join, never per output row (the kernel
  * CONSUMES them; only the 2-field struct leaves the projection). */
case class BigramLmFold(children: Seq[Expression], addK: Double)
    extends Expression {

  override def nullable: Boolean = false
  override def dataType: DataType = BigramLmFold.Out

  override def checkInputDataTypes(): TypeCheckResult = {
    val ts = children.map(_.dataType)
    val ok = ts.length == 5 &&
      ts(0).isInstanceOf[ArrayType] && ts(0).asInstanceOf[ArrayType].elementType == StringType &&
      ts(1).isInstanceOf[ArrayType] && ts(1).asInstanceOf[ArrayType].elementType == StringType &&
      ts(2).isInstanceOf[ArrayType] && ts(2).asInstanceOf[ArrayType].elementType == LongType &&
      ts(3).isInstanceOf[ArrayType] && ts(3).asInstanceOf[ArrayType].elementType == StringType &&
      ts(4).isInstanceOf[ArrayType] && ts(4).asInstanceOf[ArrayType].elementType == LongType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, array<string>, array<long>, " +
        s"array<string>, array<long>), got ${ts.map(_.simpleString).mkString(", ")}")
  }

  override def prettyName: String = BigramLmFold.Name

  override def eval(input: InternalRow): Any = {
    def arr(i: Int): ArrayData = {
      val v = children(i).eval(input)
      if (v == null) null else v.asInstanceOf[ArrayData]
    }
    BigramLmFold.fold(arr(0), arr(1), arr(2), arr(3), arr(4), addK)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val args = gens.map(g => s"(${g.isNull} ? null : ${g.value})").mkString(", ")
    ev.copy(
      code = code"""
        ${gens.map(_.code).mkString("\n")}
        InternalRow ${ev.value} = graft.functions.BigramLmFold.fold($args, $addK);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object BigramLmFold {
  val Name = "graft_bigram_lm_fold"

  val Out: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("total", DoubleType, nullable = true)))

  private val Space = UTF8String.fromString(" ")

  /** Binary search `key` in `keys` (sorted UTF8_BINARY ascending, unique);
    * the matching count from `cnts`, else 0 — `coalesce(cnt, 0)` of the
    * left join this replaces. */
  private def lookup(keys: ArrayData, cnts: ArrayData, key: UTF8String): Long = {
    if (keys == null) return 0L
    var lo = 0
    var hi = keys.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = keys.getUTF8String(mid).compareTo(key)
      if (c == 0) return cnts.getLong(mid)
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    0L
  }

  def fold(grams: ArrayData, bigKeys: ArrayData, bigCnts: ArrayData,
           uniKeys: ArrayData, uniCnts: ArrayData, addK: Double): InternalRow = {
    val n = if (grams == null) 0 else grams.numElements()
    if (n == 0) return new GenericInternalRow(Array[Any](0L, null))
    val v: Double = (if (uniKeys == null) 0 else uniKeys.numElements()).toDouble
    var total = 0.0
    var i = 0
    while (i < n) {
      val g = grams.getUTF8String(i)
      val sp = g.indexOf(Space, 0)
      val w1 = if (sp < 0) g else g.substring(0, sp)
      val c12 = lookup(bigKeys, bigCnts, g)
      val c1 = lookup(uniKeys, uniCnts, w1)
      total += java.lang.Math.log((c12.toDouble + addK) / (c1.toDouble + addK * v))
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, total))
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[BigramLmFold].getName, Name)

  val builder: Seq[Expression] => Expression = {
    case Seq(g, bk, bc, uk, uc, ke) if ke.foldable && ke.dataType == DoubleType =>
      val k = Option(ke.eval()).map(_.asInstanceOf[Double]).getOrElse(
        throw new IllegalArgumentException(s"$Name: addK literal is NULL"))
      BigramLmFold(Seq(g, bk, bc, uk, uc), k)
    case other => throw new IllegalArgumentException(
      s"$Name expects (grams, bigKeys, bigCnts, uniKeys, uniCnts, addK double literal), got " +
        other.map(_.dataType.simpleString).mkString(", "))
  }
}
