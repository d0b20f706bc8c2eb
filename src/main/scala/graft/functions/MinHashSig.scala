package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole MinHash signature in one codegen'd pass over the shingle array:
  * `graft_minhash_sig(sh, numHashes)` → `array<long>` of the `numHashes`
  * per-permutation minima, or NULL for an empty (or NULL) shingle array.
  *
  * This is the in-row form of the LSH signature stage (r15, guide §2.4
  * remove shuffles outright): the previous shape exploded every shingle,
  * shuffled on the doc id, and ran a 64-column min HashAggregate —
  * `min(graft_xxhash64_seeded(xxhash64(s), j))` per permutation. The
  * shingle table already holds ONE row per doc, so the aggregate's only
  * job was to undo the explode; computing the running minima inside the
  * row deletes the explode, the shuffle and the aggregate from every
  * LSH consumer (pairs, cross-pairs, the persisted index build).
  *
  * Bit-parity contract (what keeps the verified pair set hash-exact):
  * per element the base hash is Spark's own `xxhash64(s)` (XXH64 over
  * the UTF8 bytes, seed 42; a NULL element leaves the seed untouched —
  * the builtin's behavior, preserved here for defense though shingle
  * arrays are null-free by construction), and the j-th permutation is
  * `XXH64.hashLong(base, seedFor(j))` — exactly
  * [[SeededXxHash64Long]]'s arithmetic. Min over the same multiset,
  * order-independent. DedupSpec pins kernel signatures == the
  * explode+groupBy formulation. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, int literal), got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // an EMPTY shingle array yields NULL even when the child can't be null
  // (the explode-based formulation emitted no row for it)
  override def nullable: Boolean = true
  override def prettyName: String = MinHashSig.Name

  override def nullSafeEval(a: Any): Any =
    MinHashSig.signature(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.MinHashSig.signature($a, $numHashes);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
    code
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  val Name = "graft_minhash_sig"

  // per-numHashes seed tables, computed once per JVM (they are pure
  // functions of the permutation index — SeededXxHash64Long.seedFor)
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()
  private def seeds(n: Int): Array[Long] =
    seedCache.computeIfAbsent(n, k => Array.tabulate(k)(SeededXxHash64Long.seedFor))

  /** NULL for empty input — the explode-based formulation emitted no
    * signature row for a shingle-less doc, and the caller filters the
    * NULLs to reproduce exactly that. */
  def signature(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val sd = seeds(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      // base = xxhash64(element): XXH64 over the UTF8 bytes at seed 42;
      // a NULL element leaves the seed untouched (builtin parity)
      val base =
        if (arr.isNullAt(i)) 42L
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      var j = 0
      while (j < numHashes) {
        val v = XXH64.hashLong(base, sd(j))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[MinHashSig].getName, Name)

  val builder: Seq[Expression] => Expression = {
    case Seq(a, IntegerLiteral(n)) =>
      require(n >= 1, s"$Name: numHashes must be >= 1: $n")
      MinHashSig(a, n)
    case other => throw new IllegalArgumentException(
      s"$Name expects (array<string>, numHashes int literal), got " +
        other.map(_.dataType.simpleString).mkString(", "))
  }
}
