package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-language char-n-gram LM scores in one codegen'd pass:
  * `graft_ngram_lm_scores(gc, keys, cnts, tots, v, addK)` → `array<long>`
  * — for each language index `li`, the INTEGER MICRO-UNIT sum
  * `Σ_gram round(1e6 · cnt · ln((c+k)/(tot_li+k·V)))` over the document's
  * per-gram count array `gc` (`array<struct<gram, cnt>>`, the
  * [[CharNgramCounts]] output), where `c` is the language's count for the
  * gram (`keys(li)`/`cnts(li)`, key arrays sorted in UTF8_BINARY order for
  * the binary-search lookup; missing → 0), `tot_li` the language's total
  * count at this gram size, and `V` the size's cross-language vocabulary.
  *
  * This is [[graft.ops.TextAnalysis.modelScore]]'s per-position pipeline —
  * explode(gram counts) × cross-join over every language × broadcast
  * model joins × per-(doc, lang) long-sum shuffle — collapsed into the
  * row (guide §2.4): the #langs× amplified gram stream never materializes
  * and the fold needs no exchange. EXACT parity: the terms are the same
  * multiset (every (gram, lang) pair, seen or smoothed), each term is the
  * identical expression tree (`1e6 * (double)cnt * Math.log(((double)c +
  * k) / ((double)tot + k·(double)V))` through Spark's own
  * `round(…)` double semantics — `java.math.BigDecimal.valueOf(x)
  * .setScale(0, HALF_UP)` — then the integral-value long cast), and
  * integer micro-unit addition is order-independent, which is precisely
  * why the r8 design rounded per term. An empty/NULL `gc` yields all-zero
  * scores — the caller gates the no-gram case to NULL itself (the old
  * left join produced no row there). */
case class NgramLmScores(children: Seq[Expression], addK: Double)
    extends Expression {

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ts = children.map(_.dataType)
    val gcOk = ts.head match {
      case ArrayType(st: StructType, _) => st.fields.length == 2 &&
        st.fields(0).dataType == StringType && st.fields(1).dataType == LongType
      case _ => false
    }
    val ok = ts.length == 5 && gcOk &&
      (ts(1) match { case ArrayType(ArrayType(StringType, _), _) => true; case _ => false }) &&
      (ts(2) match { case ArrayType(ArrayType(LongType, _), _) => true; case _ => false }) &&
      (ts(3) match { case ArrayType(LongType, _) => true; case _ => false }) &&
      ts(4) == LongType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<struct<gram,cnt>>, array<array<string>>, " +
        s"array<array<long>>, array<long>, long), got ${ts.map(_.simpleString).mkString(", ")}")
  }

  override def prettyName: String = NgramLmScores.Name

  override def eval(input: InternalRow): Any = {
    val gc = children(0).eval(input)
    val keys = children(1).eval(input)
    val cnts = children(2).eval(input)
    val tots = children(3).eval(input)
    val v = children(4).eval(input)
    NgramLmScores.scores(
      if (gc == null) null else gc.asInstanceOf[ArrayData],
      if (keys == null) null else keys.asInstanceOf[ArrayData],
      if (cnts == null) null else cnts.asInstanceOf[ArrayData],
      if (tots == null) null else tots.asInstanceOf[ArrayData],
      if (v == null) 0L else v.asInstanceOf[Long], addK)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val arrArgs = gens.take(4).map(g => s"(${g.isNull} ? null : ${g.value})").mkString(", ")
    val vArg = s"(${gens(4).isNull} ? 0L : ${gens(4).value})"
    ev.copy(
      code = code"""
        ${gens.map(_.code).mkString("\n")}
        ArrayData ${ev.value} = graft.functions.NgramLmScores.scores($arrArgs, $vArg, $addK);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object NgramLmScores {
  val Name = "graft_ngram_lm_scores"

  /** One micro-unit term, replicating the SQL tree bit-for-bit:
    * `round(1e6 * cnt * ln((c+k)/(tot+k*V))).cast(long)` — Spark's Round
    * on a double goes through `java.math.BigDecimal.valueOf` (shortest
    * decimal representation) with HALF_UP, and the ANSI double→long cast
    * of the already-integral result is exact. */
  def microTerm(cnt: Long, c: Long, tot: Long, v: Long, addK: Double): Long = {
    val lp = java.lang.Math.log((c.toDouble + addK) / (tot.toDouble + addK * v.toDouble))
    java.math.BigDecimal.valueOf(1e6 * cnt.toDouble * lp)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }

  private def lookup(keys: ArrayData, cnts: ArrayData, key: UTF8String): Long = {
    var lo = 0
    var hi = keys.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val cmp = keys.getUTF8String(mid).compareTo(key)
      if (cmp == 0) return cnts.getLong(mid)
      else if (cmp < 0) lo = mid + 1
      else hi = mid - 1
    }
    0L
  }

  def scores(gc: ArrayData, keys: ArrayData, cnts: ArrayData, tots: ArrayData,
             v: Long, addK: Double): ArrayData = {
    val nLangs = if (tots == null) 0 else tots.numElements()
    val out = new Array[Long](nLangs)
    val nGrams = if (gc == null) 0 else gc.numElements()
    var li = 0
    while (li < nLangs) {
      val kLi = keys.getArray(li)
      val cLi = cnts.getArray(li)
      val tot = tots.getLong(li)
      var s = 0L
      var gi = 0
      while (gi < nGrams) {
        val row = gc.getStruct(gi, 2)
        val gram = row.getUTF8String(0)
        val cnt = row.getLong(1)
        s += microTerm(cnt, lookup(kLi, cLi, gram), tot, v, addK)
        gi += 1
      }
      out(li) = s
      li += 1
    }
    new GenericArrayData(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[NgramLmScores].getName, Name)

  val builder: Seq[Expression] => Expression = {
    case Seq(gc, k, c, t, v, ke) if ke.foldable && ke.dataType == DoubleType =>
      val addK = Option(ke.eval()).map(_.asInstanceOf[Double]).getOrElse(
        throw new IllegalArgumentException(s"$Name: addK literal is NULL"))
      NgramLmScores(Seq(gc, k, c, t, v), addK)
    case other => throw new IllegalArgumentException(
      s"$Name expects (gramCounts, keys, cnts, tots, v, addK double literal), got " +
        other.map(_.dataType.simpleString).mkString(", "))
  }
}

/** Language argmax over stacked per-gram-size score arrays:
  * `graft_lm_argmax(scores, langs)` → `struct<lang, micro>` where
  * `scores` is `array<array<long>>` (one [[NgramLmScores]] result per
  * trained gram size, each indexed by language) and `langs` the
  * lang-index order. Per language the sizes' micro sums add (long
  * addition — order-free), and the winner replicates
  * `max(struct(micro, lang))`: larger micro wins, exact ties go to the
  * UTF8_BINARY-larger language. NULL/empty `langs` → NULL (the old
  * left-join's no-model row). */
case class LmArgmax(children: Seq[Expression]) extends Expression {

  override def nullable: Boolean = true
  override def dataType: DataType = LmArgmax.Out

  override def checkInputDataTypes(): TypeCheckResult = {
    val ts = children.map(_.dataType)
    val ok = ts.length == 2 &&
      (ts(0) match { case ArrayType(ArrayType(LongType, _), _) => true; case _ => false }) &&
      (ts(1) match { case ArrayType(StringType, _) => true; case _ => false })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<array<long>>, array<string>), got " +
        ts.map(_.simpleString).mkString(", "))
  }

  override def prettyName: String = LmArgmax.Name

  override def eval(input: InternalRow): Any = {
    val s = children(0).eval(input)
    val l = children(1).eval(input)
    LmArgmax.argmax(
      if (s == null) null else s.asInstanceOf[ArrayData],
      if (l == null) null else l.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val args = gens.map(g => s"(${g.isNull} ? null : ${g.value})").mkString(", ")
    val resVar = ctx.freshName("argmax")
    ev.copy(code = code"""
      ${gens.map(_.code).mkString("\n")}
      InternalRow $resVar = graft.functions.LmArgmax.argmax($args);
      boolean ${ev.isNull} = ($resVar == null);
      InternalRow ${ev.value} = $resVar;
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object LmArgmax {
  val Name = "graft_lm_argmax"

  val Out: StructType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("micro", LongType, nullable = false)))

  def argmax(scores: ArrayData, langs: ArrayData): InternalRow = {
    if (langs == null || scores == null) return null
    val nLangs = langs.numElements()
    if (nLangs == 0) return null
    val nStacks = scores.numElements()
    var bestLang: UTF8String = null
    var bestMicro = 0L
    var li = 0
    while (li < nLangs) {
      var total = 0L
      var si = 0
      while (si < nStacks) {
        total += scores.getArray(si).getLong(li)
        si += 1
      }
      val lang = langs.getUTF8String(li)
      if (bestLang == null || total > bestMicro ||
          (total == bestMicro && lang.compareTo(bestLang) > 0)) {
        bestLang = lang
        bestMicro = total
      }
      li += 1
    }
    new GenericInternalRow(Array[Any](bestLang, bestMicro))
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[LmArgmax].getName, Name)

  val builder: Seq[Expression] => Expression = {
    case Seq(s, l) => LmArgmax(Seq(s, l))
    case other => throw new IllegalArgumentException(
      s"$Name expects (scores, langs), got ${other.size} args")
  }
}
