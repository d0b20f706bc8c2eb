package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** XXH64 of ONE long under a precomputed seed — the MinHash permutation
  * family primitive.
  *
  * `SeededXxHash64Long(h, seedFor(j))` is bit-identical to Spark's
  * `xxhash64(lit(j), h)`: the builtin folds children left-to-right with
  * `seed' = XXH64.hashLong(child, seed)` starting at 42, so hashing the
  * literal `j` first just derives seed `XXH64.hashLong(j, 42)` — which
  * [[SeededXxHash64Long.seedFor]] precomputes once at PLAN time. Per row
  * that turns the builtin's two `hashLong` mixes (plus a two-child
  * null-tracking loop) into a single static call, halving the hash work
  * of a k-permutation MinHash signature (k of these per exploded shingle
  * row — the dominant multiplier of the LSH signature stage at corpus
  * scale). Codegen'd; the interpreted path is the same static call.
  *
  * Reference behavior mirrored: v3io-tsdb has no MinHash; this serves the
  * training-data dedup north star (SURVEY §2 additions).
  */
case class SeededXxHash64Long(child: Expression, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects bigint, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_xxhash64_seeded"

  override def nullSafeEval(v: Any): Any =
    XXH64.hashLong(v.asInstanceOf[Long], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.XXH64" +
        s".hashLong($c, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SeededXxHash64Long {
  val Name = "graft_xxhash64_seeded"

  val info: ExpressionInfo =
    new ExpressionInfo(classOf[SeededXxHash64Long].getName, Name)

  /** Seed of the j-th derived permutation — exactly what Spark's
    * `xxhash64(lit(j), …)` computes from its first child (an INT literal,
    * so the builtin mixes it with `hashInt`, not `hashLong`). */
  def seedFor(j: Int): Long = XXH64.hashInt(j, 42L)

  /** Seed for a BIGINT literal index — the builtin folds a LongType
    * child with `hashLong`, a DIFFERENT value than `hashInt` of the same
    * number, so the two widths must derive different seeds to keep the
    * documented `xxhash64(j, h)` equivalence type-faithful. */
  def seedForLong(j: Long): Long = XXH64.hashLong(j, 42L)

  /** SQL surface: `graft_xxhash64_seeded(h, j)` with a foldable integer
    * permutation index — it parameterizes the generated code, so it must
    * be a literal, not data. Equals `xxhash64(j, h)` at j's own type. */
  val builder: Seq[Expression] => Expression = {
    case Seq(c, jExpr) if jExpr.foldable =>
      jExpr.eval() match {
        case j: java.lang.Integer => SeededXxHash64Long(c, seedFor(j.intValue()))
        case j: java.lang.Long => SeededXxHash64Long(c, seedForLong(j.longValue()))
        case other => throw new IllegalArgumentException(
          s"$Name expects an integer literal permutation index, got $other")
      }
    case Seq(_, jExpr) => throw new IllegalArgumentException(
      s"$Name requires the permutation index to be a foldable integer " +
        s"literal (it parameterizes the generated code), got ${jExpr.sql}")
    case other => throw new IllegalArgumentException(
      s"$Name expects (hash, index literal), got ${other.size} args")
  }
}
