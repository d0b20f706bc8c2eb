package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Sign-random-projection band buckets for one `array<float>` embedding:
  * element `b` of the returned `array<long>` packs the sign bits of
  * hyperplanes `[b·rows, (b+1)·rows)` (rows = bits/bands) — the LSH
  * bucket key for band `b`. Hyperplane components are Rademacher ±1 from
  * a seeded hash ([[SrpPlanes]]), so `P[signs agree] = 1 − θ/π`, the
  * classic SRP collision guarantee.
  *
  * Why a custom expression rather than `sum` over posexploded dims (the
  * previous formulation): Spark does not fix the accumulation order of a
  * shuffled `sum`, so a vector whose projection onto some hyperplane is
  * near zero could flip its sign bit between runs or partitionings —
  * LSH buckets must be REPRODUCIBLE. Here every plane sum is a
  * left-to-right double fold over the array in index order, per row, so
  * signatures are bit-stable. It also codegens (HOFs would interpret)
  * and needs no shuffle at all — signatures materialize at scan speed.
  */
case class SrpBandBuckets(child: Expression, bits: Int, bands: Int)
    extends UnaryExpression {
  require(bands > 0 && bits % bands == 0 && bits / bands <= 63,
    s"bits ($bits) must be a multiple of bands ($bands) with <= 63 rows per band")

  private val rows = bits / bands

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_srp_bands"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dim = x.numElements()
    val tbl = SrpPlanes.signTable(bits, dim)
    val out = new Array[Long](bands)
    var j = 0
    while (j < bits) {
      var s = 0.0
      val off = j * dim
      var d = 0
      while (d < dim) { s += x.getFloat(d).toDouble * tbl(off + d); d += 1 }
      out(j / rows) = (out(j / rows) << 1) | (if (s >= 0) 1L else 0L)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tbl = ctx.freshName("tbl")
      val out = ctx.freshName("out")
      val dim = ctx.freshName("dim")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      s"""
         |final int $dim = $a.numElements();
         |final byte[] $tbl = graft.functions.SrpPlanes.signTable($bits, $dim);
         |final long[] $out = new long[$bands];
         |for (int $j = 0; $j < $bits; $j++) {
         |  double $s = 0.0;
         |  final int $off = $j * $dim;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    $s += ((double) $a.getFloat($d)) * $tbl[$off + $d];
         |  }
         |  $out[$j / $rows] = ($out[$j / $rows] << 1) | ($s >= 0 ? 1L : 0L);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBandBuckets {
  val Name = "graft_srp_bands"

  val info: ExpressionInfo = new ExpressionInfo(classOf[SrpBandBuckets].getName, Name)

  /** SQL surface: `graft_srp_bands(vec, bits, bands)` with foldable int
    * plane counts — they parameterize the generated code, so they must
    * be literals, not data. */
  val builder: Seq[Expression] => Expression = {
    case Seq(c, b1, b2) if b1.foldable && b2.foldable =>
      (b1.eval(), b2.eval()) match {
        case (bits: java.lang.Integer, bands: java.lang.Integer) =>
          SrpBandBuckets(c, bits.intValue(), bands.intValue())
        case other => throw new IllegalArgumentException(
          s"$Name expects integer literal (bits, bands), got $other")
      }
    case Seq(_, b1, b2) => throw new IllegalArgumentException(
      s"$Name requires bits and bands to be foldable integer literals " +
        s"(they parameterize the generated code), got (${b1.sql}, ${b2.sql})")
    case other => throw new IllegalArgumentException(
      s"$Name expects (vec, bits literal, bands literal), got ${other.size} args")
  }
}

/** Memoized Rademacher ±1 hyperplane tables for [[SrpBandBuckets]]:
  * `signTable(bits, dim)(j*dim + d)` is the d-th component of hyperplane
  * j, derived from the public XXH64 mix of (j, d) under a fixed seed —
  * deterministic across JVMs, executors and Spark versions; nothing is
  * stored or shipped. A (bits, dim) table is bits×dim bytes (256×64 =
  * 16 KiB for the defaults) and corpora use one embedding dim, so the
  * unbounded memo map holds a handful of tiny arrays per JVM. */
object SrpPlanes {
  private final val Seed = 42L
  private val cache = new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()

  def signTable(bits: Int, dim: Int): Array[Byte] = {
    val key = (bits.toLong << 32) | (dim.toLong & 0xffffffffL)
    val hit = cache.get(key)
    if (hit != null) return hit
    val t = new Array[Byte](bits * dim)
    var j = 0
    while (j < bits) {
      var d = 0
      while (d < dim) {
        val h = XXH64.hashLong((j.toLong << 32) | (d.toLong & 0xffffffffL), Seed)
        t(j * dim + d) = if ((h & 1L) == 0L) -1 else 1
        d += 1
      }
      j += 1
    }
    cache.putIfAbsent(key, t)
    cache.get(key)
  }
}
