package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's aggregate algebra (reference `pkg/aggregate/`).
  *
  * Raw (partial-state) aggregates — `pkg/aggregate/functions.go:30-151`:
  * count, sum, sqr (Σv²), min, max, last (time-ordered). Derived (virtual)
  * aggregates are finalized from the partials — `pkg/aggregate/iterator.go:290-338`:
  * avg = sum/count; stdvar = (n·Σv² − (Σv)²)/(n(n−1)); stddev = √stdvar;
  * rate = Δlast / (interval/1000) between ADJACENT buckets.
  *
  * NaN/±Inf samples are "undefined" and skipped (`pkg/utils/misc.go:31-37`) —
  * here they are nulled out before aggregation, which Spark aggregates skip.
  * The reference returns NaN for undefined derived cells; at the SQL boundary
  * we emit NULL (both mean "undefined"; NULL hashes identically in DuckDB).
  *
  * Everything is plain `org.apache.spark.sql.functions` — codegen'd,
  * partial-aggregatable (map-side combine) and shuffle-efficient at scale.
  */
object Aggregates {

  val RawAggregates = Seq("count", "sum", "sqr", "min", "max", "last")
  val VirtualAggregates = Seq("avg", "stddev", "stdvar", "rate")
  val All: Set[String] = (RawAggregates ++ VirtualAggregates).toSet

  /** Partials each virtual aggregate needs (reference "hidden columns",
    * `select.go:447-481`; count is implicitly added to gate empty buckets,
    * `aggregate.go:151-173`). */
  def dependencies(fn: String): Seq[String] = fn match {
    case "avg"                => Seq("count", "sum")
    case "stddev" | "stdvar"  => Seq("count", "sum", "sqr")
    case "rate"               => Seq("last")
    case raw if All(raw)      => Seq(raw)
    case other =>
      throw new IllegalArgumentException(s"unknown aggregate '$other' " +
        s"(supported: ${All.toSeq.sorted.mkString(",")})")
  }

  /** Expand a requested aggregate list to the raw partials to compute,
    * always including count (empty-bucket gate). */
  def requiredPartials(fns: Seq[String]): Seq[String] =
    ("count" +: fns.flatMap(dependencies)).distinct
      .filter(RawAggregates.contains)

  /** The Spark aggregation expression for one raw partial, over a
    * NaN-cleaned value column and the epoch-ms time column. `last_t` (the
    * time of the last defined sample) rides along with `last` so partials
    * from the SAME bucket merge correctly (incremental rollup updates —
    * bucket time alone can't order them). */
  def partialExpr(fn: String, value: Column, time: Column): Column = fn match {
    case "count"  => count(value).cast("double")
    case "sum"    => sum(value)
    case "sqr"    => sum(value * value)
    case "min"    => min(value)
    case "max"    => max(value)
    // time-ordered last (functions.go:131-151) — max_by is codegen'd
    case "last"   => max_by(value, when(value.isNotNull, time))
    case "last_t" => max(when(value.isNotNull, time))
  }

  /** Partial list with the `last_t` companion injected after `last`. */
  def withCompanions(partials: Seq[String]): Seq[String] =
    partials.flatMap { case "last" => Seq("last", "last_t"); case f => Seq(f) }

  /** Merge expressions for re-aggregating partials to a coarser step
    * (server-side A2, reference `aggregate.go:317-361`) or merging two
    * partial sets of the same bucket (incremental ingest): count/sum/sqr
    * add, min/max merge, last follows the greatest `ord` (= `last_t`). */
  def mergeExpr(fn: String, partial: Column, ord: Column): Column = fn match {
    case "count"  => sum(partial)
    case "sum"    => sum(partial)
    case "sqr"    => sum(partial)
    case "min"    => min(partial)
    case "max"    => max(partial)
    case "last"   => max_by(partial, when(partial.isNotNull, ord))
    case "last_t" => max(partial)
  }

  /** Finalize one requested aggregate from its partial columns.
    * `partial(name)` resolves the partial column; rate is finalized later
    * (needs an inter-bucket lag — see [[QueryEngine]]). */
  def finalExpr(fn: String, partial: String => Column): Column = fn match {
    case raw if RawAggregates.contains(raw) =>
      // empty bucket (count==0 — e.g. all-NaN samples) → undefined
      when(partial("count") > 0, partial(raw))
    case "avg" =>
      when(partial("count") > 0, partial("sum") / partial("count"))
    case "stdvar" =>
      stdvarExpr(partial)
    case "stddev" =>
      sqrt(stdvarExpr(partial))
    case other =>
      throw new IllegalArgumentException(s"unexpected aggregate '$other'")
  }

  /** (n·Σv² − (Σv)²)/(n(n−1)) — the sample-variance formula the reference
    * computes from partials (`iterator.go:319-326`). n==1 divides by zero
    * (NaN in Go) → undefined → NULL here. */
  private def stdvarExpr(partial: String => Column): Column = {
    val n = partial("count")
    when(n > 1, (n * partial("sqr") - partial("sum") * partial("sum")) / (n * (n - lit(1.0))))
  }
}
