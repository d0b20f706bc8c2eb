package graft.query

/** One requested output column (reference `pkg/pquerier/types.go:56-108`).
  *
  * @param metric        metric name ("" = inherit SelectParams.name)
  * @param function      aggregate ("", "count", "sum", "sqr", "min", "max",
  *                      "last", "avg", "stddev", "stdvar", "rate"; a `_all`
  *                      suffix selects cross-series aggregation)
  * @param alias         output column alias
  * @param interpolator  "none"|"nan"|"prev_val"|"next_val"|"linear".
  *                      "" on an EXPLICIT requested column means `none`
  *                      (unconditional next — reference
  *                      `StrToInterpolateType`, `interpolate.go:62`); the
  *                      `next_val` tolerance default (`interpolate.go:54`)
  *                      only applies to columns synthesized from the
  *                      Name/Functions strings (`querier.go:90`)
  * @param tolerance     max ms gap for interpolation (0 = 2×step, reference
  *                      `select.go:41` defaultToleranceFactor)
  */
case class RequestedColumn(
    metric: String,
    function: String = "",
    alias: String = "",
    interpolator: String = "",
    tolerance: Long = 0L)

/** Query parameters (reference `pkg/pquerier/querier.go:60-73` SelectParams).
  *
  * Times are unix MILLISECONDS. `filter` is a Spark SQL boolean expression
  * over `name` and `labels['<key>']` (the reference's filter dialect is
  * translated by [[graft.sql.TsdbSql]]).
  */
case class SelectParams(
    name: String = "",
    functions: String = "",
    from: Long = 0L,
    to: Long = 0L,
    step: Long = 0L,
    filter: String = "",
    groupBy: String = "",
    aggregationWindow: Long = 0L,
    // overlapping-window multipliers of step (reference `Windows []int`,
    // `querier/querier.go:65` — e.g. Seq(1,7,30) with a 1d step)
    windows: Seq[Int] = Nil,
    requestedColumns: Seq[RequestedColumn] = Nil,
    usePreciseAggregations: Boolean = false,
    // time-travel snapshot handle (r8): > 0 routes the query through
    // TsdbTable.selectAsOf at this committed batch seq (SQL `ASOF n`);
    // 0 = the current view
    asOfSeq: Long = 0L) {

  require(to == 0 || from <= to, s"from ($from) must be <= to ($to)")

  /** All requested functions — the `functions` string plus any carried by
    * requested columns — lowercased (reference SQL is case-insensitive) and
    * deduped (a repeated name would emit duplicate output columns). */
  def functionList: Seq[String] =
    (functions.split(",").map(_.trim).toSeq ++ requestedColumns.map(_.function))
      .filter(_.nonEmpty).map(_.toLowerCase).distinct

  def groupByLabels: Seq[String] =
    groupBy.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** Cross-series if any function carries the `_all` suffix (reference
    * `aggregate.go:36`; mixing `_all` and plain is rejected,
    * `select.go:427-443`). */
  def isCrossSeries: Boolean = {
    val all = functionList.map(_.endsWith("_all"))
    if (all.nonEmpty && all.exists(identity) && !all.forall(identity))
      throw new IllegalArgumentException(
        "cannot mix cross-series (_all) and per-series aggregates in one query")
    all.nonEmpty && all.forall(identity)
  }

  /** Aggregate names with any `_all` suffix stripped. */
  def baseFunctions: Seq[String] = functionList.map(SelectParams.stripAll)

  /** A select list naming more than one metric with any aggregate must
    * route through [[QueryEngine.multiAggregateVia]] (which also rejects
    * raw/aggregate mixes). Keying on ALL metrics, not just aggregated
    * ones, keeps `select sum(cpu), mem` from slipping into a
    * single-metric path and aggregating every metric in the table. */
  def isMultiMetricAggregate: Boolean =
    requestedColumns.map(_.metric).distinct.size > 1 &&
      requestedColumns.exists(_.function.nonEmpty)

  /** Effective step: 0 with functions present means one bucket spanning the
    * whole range (reference `select.go:82-84`). */
  def effectiveStep: Long =
    if (step == 0 && functionList.nonEmpty) math.max(to - from, 1L)
    else step
}

object SelectParams {
  def stripAll(fn: String): String =
    if (fn.endsWith("_all")) fn.dropRight(4) else fn

  /** v1 (legacy Prometheus-querier) sugar — reference
    * `querier/querier.go:199-206`: a query with NO aggregate functions and
    * a step at least the rollup interval implicitly aggregates with `avg`,
    * provided the table materializes avg's ingredients (count+sum —
    * `AggrType().HasAverage()`). Kept OFF the default v2 path (the v2
    * pquerier treats no-functions+step as downsampling); callers opt in
    * (CLI `--v1-avg`).
    *
    * @param rollupIntervalMs the table's rollup granularity
    * @param materialized     the table's materialized raw partials
    */
  def v1ImplicitAvg(p: SelectParams, rollupIntervalMs: Long,
                    materialized: Seq[String]): SelectParams =
    if (p.functionList.isEmpty && p.requestedColumns.isEmpty &&
        p.step > 0 && p.step >= rollupIntervalMs &&
        // count is always materialized implicitly (Rollup.build prepends
        // it), so avg needs only `sum` listed — same dependency rule as
        // canServerAggregate
        materialized.contains("sum"))
      p.copy(functions = "avg")
    else p
}
