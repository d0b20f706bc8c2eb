package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Interpolation semantics (reference `pkg/pquerier/interpolate.go:29-120`).
  *
  * Given a grid time `tc` and the surrounding raw samples — `prev` = last
  * sample with `t < tc`, `next` = first sample with `t >= tc` (the
  * reference's `PeakBack`/`Seek`, `chunkIterator.go:77-137,241`) — produce
  * the cell value, or NULL for "unset" (the reference's `(0,0)` return,
  * which leaves the frame cell empty).
  *
  * Exact-match (`next.t == tc`) is handled by the caller and never reaches
  * these functions (`downsampleRawData`, `collector.go:248-251`). All
  * callers guard on `next` existing — a failed Seek leaves the cell unset
  * regardless of the interpolator (`collector.go:246`).
  *
  * Everything here is a plain Catalyst expression — codegen'd, no UDFs.
  */
object Interpolation {

  val Kinds = Set("none", "nan", "prev_val", "next_val", "linear")

  /** Default interpolator (`interpolate.go:54` — `next_val`). */
  val Default = "next_val"

  /** Default tolerance = 2 x step (`select.go:41` defaultToleranceFactor). */
  def defaultTolerance(stepMs: Long): Long = 2 * stepMs

  /** Case-insensitive, `lin` alias accepted (`interpolate.go:60-73`). */
  def normalize(kind: String): String = kind.toLowerCase match {
    case "lin" => "linear"
    case k => k
  }

  /** The interpolated value for a non-exact grid cell; NULL = leave unset.
    *
    * @param kind   none|nan|prev_val|next_val|linear ("" = next_val)
    * @param tolMs  max allowed distance to the donor sample(s)
    */
  def valueExpr(
      kind: String,
      tolMs: Long,
      tc: Column,
      prevT: Column, prevV: Column,
      nextT: Column, nextV: Column): Column = {
    val nan = lit(Double.NaN)
    normalize(kind) match {
      // "none" returns the next raw value unconditionally (interpolate.go:108-112)
      case "none" => nextV
      case "nan" => nan
      // prev_val: vprev iff |tc-tprev| <= tol (interpolate.go:83-88);
      // a NULL prevT (no earlier sample) falls through `when` to NULL = unset
      case "prev_val" => when(tc - prevT <= tolMs, prevV)
      case "next_val" | "" => when(nextT - tc <= tolMs, nextV)
      // linear: both neighbors within tolerance; NaN neighbors poison
      // (interpolate.go:93-106)
      case "linear" =>
        when(tc - prevT <= tolMs && nextT - tc <= tolMs,
          when(isnan(prevV) || isnan(nextV), nan)
            .otherwise(prevV + (nextV - prevV) * (tc - prevT) / (nextT - prevT)))
      case other =>
        throw new IllegalArgumentException(
          s"unknown interpolator '$other' (supported: ${Kinds.mkString(",")})")
    }
  }
}
