package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Samples
import graft.query.{QueryEngine, SelectParams}
import graft.storage.Rollup

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator from SURVEY.md §2 (the
  * Scaladoc of the underlying implementation cites the reference file:line
  * whose semantics it reproduces); [[oracleSql]] holds the DuckDB
  * equivalent the driver hash-compares against.
  *
  * The TSDB entries run over the `events` table mapped to the reference's
  * sample model (name=event_type, labels={user}, t=epoch-ms, v=value) —
  * see [[graft.core.Samples]]. Double outputs are rounded to 6 dp on BOTH
  * sides so float summation order (Spark parallel vs DuckDB serial) cannot
  * flip the driver's hash compare.
  */
object SparkEntry {

  // events span 2024-01-01 .. 2024-01-31 UTC (TESTDATA.md, seed=42)
  private val F = 1704067200000L // 2024-01-01T00:00:00Z
  private val T = 1706659200000L // 2024-01-31T00:00:00Z
  private val Hour = 3600000L
  private val Day = 86400000L

  /** DuckDB view of the sample model — MUST stay in lockstep with
    * [[Samples.fromEvents]]. */
  private val SamplesCte =
    """SELECT event_type AS name,
      |       'user=' || CAST(user_id AS VARCHAR) AS labels_str,
      |       epoch_ns(ts) // 1000000 AS tt, value AS v
      |FROM events""".stripMargin

  private def r6(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c), 6)))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------------------------- A3/A4
    // relational multi-aggregate groupBy (TPC-H Q1 shape)
    "q1_agg" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ------------------------------------------------------------- S1/P1-P4
    // raw range scan: time-range + label-filter pushdown (select.go:572-606)
    "tsdb_raw" -> ((s, dir) => {
      QueryEngine.raw(Samples.fromEvents(s, dir),
        SelectParams(name = "click", filter = "labels['user'] = '7'", from = F, to = T))
    }),

    // ------------------------------------------------------------------- S4
    "tsdb_names" -> ((s, dir) => QueryEngine.names(Samples.fromEvents(s, dir))),

    // ------------------------------------------------------------------- S5
    "tsdb_label_values" -> ((s, dir) =>
      QueryEngine.labelValues(Samples.fromEvents(s, dir), "user")),
    "tsdb_label_sets" -> ((s, dir) =>
      QueryEngine.labelSets(Samples.fromEvents(s, dir))),

    // ------------------------------------------------------------------ S12
    "tsdb_count_all" -> ((s, dir) =>
      Samples.fromEvents(s, dir).agg(count(lit(1)).as("cnt"))),

    // ---------------------------------------------------------------- A3/A4
    // full aggregate surface on the 1d tumbling grid (collector.go:171-185)
    "tsdb_client_agg" -> ((s, dir) => {
      val out = QueryEngine.select(Samples.fromEvents(s, dir),
        SelectParams(name = "click",
          functions = "count,sum,sqr,min,max,last,avg,stddev,stdvar",
          from = F, to = T, step = Day))
      r6(out, Seq("sum", "sqr", "min", "max", "last", "avg", "stddev", "stdvar"))
    }),

    // ------------------------------------------------------------------- W4
    // rate = Δlast / step_sec between ADJACENT buckets (iterator.go:327-334)
    "tsdb_rate" -> ((s, dir) => {
      val out = QueryEngine.select(Samples.fromEvents(s, dir),
        SelectParams(name = "error", functions = "rate", from = F, to = T, step = Day))
      r6(out, Seq("rate"))
    }),

    // ------------------------------------------------------------------- A6
    // GroupBy labels (select.go:354-367)
    "tsdb_groupby_label" -> ((s, dir) => {
      val out = QueryEngine.select(Samples.fromEvents(s, dir),
        SelectParams(functions = "count,sum,max", groupBy = "user",
          from = F, to = T, step = 7 * Day))
      r6(out, Seq("sum", "max"))
    }),

    // ------------------------------------------------------------------- A5
    // cross-series `_all`: per-series resample to the grid (next_val,
    // tol 2*step) then merge across series (collector.go:283-338)
    "tsdb_cross_agg" -> ((s, dir) => {
      val out = QueryEngine.select(Samples.fromEvents(s, dir),
        SelectParams(name = "purchase", functions = "count_all,sum_all,avg_all",
          from = F, to = T, step = Day))
      r6(out, Seq("sum", "avg"))
    }),

    // ------------------------------------------------------------------- W2
    // sliding aggregation window: cell c covers [c-w, c], cells round UP
    // (collector.go:345-364)
    "tsdb_sliding_window" -> ((s, dir) => {
      val out = QueryEngine.select(Samples.fromEvents(s, dir),
        SelectParams(name = "signup", functions = "count,sum,avg",
          from = F, to = T, step = Day, aggregationWindow = 3 * Day))
      r6(out, Seq("sum", "avg"))
    }),

    // ------------------------------------------------------------------- W3
    // overlapping windows ending at floor(to/step)*step (seriesset.go:186-218)
    "tsdb_overlap_windows" -> ((s, dir) => {
      val out = QueryEngine.select(Samples.fromEvents(s, dir),
        SelectParams(name = "error", functions = "count,sum",
          from = F, to = T, step = Day, windows = Seq(1, 7, 30)))
      r6(out, Seq("sum"))
    }),

    // ---------------------------------------------------------------- W5/J3
    // downsample to a 6h grid, default next_val interpolation tol 2*step
    // (collector.go:236-281)
    "tsdb_downsample" -> ((s, dir) => {
      val out = QueryEngine.select(Samples.fromEvents(s, dir),
        SelectParams(name = "view", from = F, to = T, step = 6 * Hour))
      r6(out, Seq("v"))
    }),

    // ---------------------------------------------------------------- A1/A2
    // ingest-time rollup partials merged server-side to a coarser step;
    // result must equal direct raw aggregation (aggregate.go:317-361)
    "tsdb_server_agg" -> ((s, dir) => {
      val rollup = Rollup.build(Samples.fromEvents(s, dir).filter(col("name") === "view"), 6 * Hour)
      val out = QueryEngine.serverAggregate(rollup,
        SelectParams(name = "view", from = F, to = T, step = Day),
        Seq("count", "sum", "min", "max", "last", "avg"), 6 * Hour)
      r6(out, Seq("sum", "min", "max", "last", "avg"))
    }),

    // ------------------------------------------------------------ §1.2 variant
    // variant (string) metric: time-ordered last per series per bucket
    // (vartype.go; max_by ≡ EncVariant last-write)
    "tsdb_variant_last" -> ((s, dir) => {
      Samples.variantFromEvents(s, dir)
        .withColumn("labels_str", graft.core.Labels.canonical(col("labels")))
        .filter(col("time").between(F, T))
        .groupBy(col("name"), col("labels_str"),
          (lit(F) + floor((col("time") - F) / Day).cast("long") * Day).as("t"))
        .agg(max_by(col("valueStr"), col("time")).as("last_str"))
        .orderBy("name", "labels_str", "t")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "tsdb_raw" ->
      s"""WITH s AS ($SamplesCte)
         |SELECT name, labels_str, tt AS t, v, CAST(NULL AS VARCHAR) AS vstr
         |FROM s
         |WHERE name = 'click' AND labels_str = 'user=7' AND tt BETWEEN $F AND $T
         |ORDER BY name, labels_str, t""".stripMargin,

    "tsdb_names" ->
      "SELECT DISTINCT event_type AS name FROM events ORDER BY name",

    "tsdb_label_values" ->
      "SELECT DISTINCT CAST(user_id AS VARCHAR) AS value FROM events ORDER BY value",

    "tsdb_label_sets" ->
      s"""WITH s AS ($SamplesCte)
         |SELECT DISTINCT name, labels_str FROM s ORDER BY name, labels_str""".stripMargin,

    "tsdb_count_all" ->
      "SELECT count(*) AS cnt FROM events",

    "tsdb_client_agg" ->
      s"""WITH s AS ($SamplesCte)
         |SELECT name, labels_str, $F + (tt - $F) // $Day * $Day AS t,
         |  CAST(count(v) AS DOUBLE) AS "count",
         |  round(sum(v), 6) AS "sum",
         |  round(sum(v*v), 6) AS sqr,
         |  round(min(v), 6) AS "min",
         |  round(max(v), 6) AS "max",
         |  round(max_by(v, tt), 6) AS "last",
         |  round(sum(v) / count(v), 6) AS avg,
         |  round(CASE WHEN count(v) > 1 THEN
         |    sqrt((count(v)*sum(v*v) - sum(v)*sum(v)) / (count(v)*(count(v)-1.0))) END, 6) AS stddev,
         |  round(CASE WHEN count(v) > 1 THEN
         |    (count(v)*sum(v*v) - sum(v)*sum(v)) / (count(v)*(count(v)-1.0)) END, 6) AS stdvar
         |FROM s
         |WHERE name = 'click' AND tt BETWEEN $F AND $T
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "tsdb_rate" ->
      s"""WITH s AS ($SamplesCte),
         |b AS (
         |  SELECT name, labels_str, $F + (tt - $F) // $Day * $Day AS t,
         |         max_by(v, tt) AS lastv
         |  FROM s WHERE name = 'error' AND tt BETWEEN $F AND $T
         |  GROUP BY 1, 2, 3)
         |SELECT name, labels_str, t,
         |  round(CASE WHEN lag(t) OVER w = t - $Day THEN
         |    (lastv - lag(lastv) OVER w) / ${Day / 1000}.0 END, 6) AS rate
         |FROM b WINDOW w AS (PARTITION BY name, labels_str ORDER BY t)
         |ORDER BY name, labels_str, t""".stripMargin,

    "tsdb_groupby_label" ->
      s"""WITH s AS (SELECT event_type AS name, CAST(user_id AS VARCHAR) AS "user",
         |                  epoch_ns(ts) // 1000000 AS tt, value AS v FROM events)
         |SELECT name, "user", $F + (tt - $F) // ${7 * Day} * ${7 * Day} AS t,
         |  CAST(count(v) AS DOUBLE) AS "count",
         |  round(sum(v), 6) AS "sum",
         |  round(max(v), 6) AS "max"
         |FROM s WHERE tt BETWEEN $F AND $T
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "tsdb_cross_agg" ->
      s"""WITH s AS ($SamplesCte),
         |src AS (SELECT * FROM s WHERE name = 'purchase' AND tt BETWEEN $F AND $T),
         |keys AS (SELECT DISTINCT name, labels_str FROM src),
         |grid AS (SELECT name, labels_str, UNNEST(generate_series($F, $T, $Day)) AS tc FROM keys),
         |u AS (
         |  SELECT name, labels_str, tc, CAST(NULL AS DOUBLE) AS pv, 0 AS isp FROM grid
         |  UNION ALL
         |  SELECT name, labels_str, tt AS tc, v AS pv, 1 AS isp FROM src),
         |nb AS (
         |  SELECT *,
         |    first_value(CASE WHEN isp = 1 THEN struct_pack(t := tc, v := pv) END IGNORE NULLS)
         |      OVER (PARTITION BY name, labels_str ORDER BY tc, isp
         |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
         |  FROM u),
         |res AS (
         |  SELECT name, labels_str, tc AS t,
         |         CASE WHEN nxt.t - tc <= ${2 * Day} THEN nxt.v END AS rv
         |  FROM nb WHERE isp = 0 AND nxt.t IS NOT NULL),
         |def AS (SELECT * FROM res WHERE rv IS NOT NULL)
         |SELECT name, t,
         |  CAST(count(rv) AS DOUBLE) AS "count",
         |  round(sum(rv), 6) AS "sum",
         |  round(sum(rv) / count(rv), 6) AS avg
         |FROM def GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "tsdb_sliding_window" ->
      s"""WITH s AS ($SamplesCte),
         |src AS (SELECT * FROM s WHERE name = 'signup'
         |        AND tt BETWEEN ${F - 3 * Day} AND $T),
         |e AS (
         |  SELECT name, labels_str, v,
         |         UNNEST(generate_series(
         |           greatest(CAST(ceil((tt - $F) / $Day.0) AS BIGINT), 0),
         |           least((tt + ${3 * Day} - $F) // $Day, ${(T - F) / Day}))) AS k
         |  FROM src)
         |SELECT name, labels_str, $F + k * $Day AS t,
         |  CAST(count(v) AS DOUBLE) AS "count",
         |  round(sum(v), 6) AS "sum",
         |  round(sum(v) / count(v), 6) AS avg
         |FROM e GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "tsdb_overlap_windows" ->
      s"""WITH s AS ($SamplesCte),
         |src AS (SELECT * FROM s WHERE name = 'error'),
         |e AS (
         |  SELECT src.*, w.win FROM src, (VALUES (1), (7), (30)) w(win)
         |  WHERE tt < $T AND tt > $T - CAST(win AS BIGINT) * $Day)
         |SELECT name, labels_str, win, $T - CAST(win AS BIGINT) * $Day AS t,
         |  CAST(count(v) AS DOUBLE) AS "count",
         |  round(sum(v), 6) AS "sum"
         |FROM e GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3""".stripMargin,

    "tsdb_downsample" ->
      s"""WITH s AS ($SamplesCte),
         |src AS (SELECT * FROM s WHERE name = 'view' AND tt BETWEEN $F AND $T),
         |keys AS (SELECT DISTINCT name, labels_str FROM src),
         |grid AS (SELECT name, labels_str, UNNEST(generate_series($F, $T, ${6 * Hour})) AS tc FROM keys),
         |u AS (
         |  SELECT name, labels_str, tc, CAST(NULL AS DOUBLE) AS pv, 0 AS isp FROM grid
         |  UNION ALL
         |  SELECT name, labels_str, tt AS tc, v AS pv, 1 AS isp FROM src),
         |nb AS (
         |  SELECT *,
         |    first_value(CASE WHEN isp = 1 THEN struct_pack(t := tc, v := pv) END IGNORE NULLS)
         |      OVER (PARTITION BY name, labels_str ORDER BY tc, isp
         |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
         |  FROM u)
         |SELECT name, labels_str, tc AS t,
         |       round(CASE WHEN nxt.t - tc <= ${12 * Hour} THEN nxt.v END, 6) AS v
         |FROM nb
         |WHERE isp = 0 AND nxt.t IS NOT NULL
         |  AND (CASE WHEN nxt.t - tc <= ${12 * Hour} THEN nxt.v END) IS NOT NULL
         |ORDER BY name, labels_str, t""".stripMargin,

    "tsdb_server_agg" ->
      s"""WITH s AS ($SamplesCte)
         |SELECT name, labels_str, $F + (tt - $F) // $Day * $Day AS t,
         |  CAST(count(v) AS DOUBLE) AS "count",
         |  round(sum(v), 6) AS "sum",
         |  round(min(v), 6) AS "min",
         |  round(max(v), 6) AS "max",
         |  round(max_by(v, tt), 6) AS "last",
         |  round(sum(v) / count(v), 6) AS avg
         |FROM s WHERE name = 'view' AND tt BETWEEN $F AND $T
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "tsdb_variant_last" ->
      s"""WITH s AS (SELECT 'props' AS name,
         |                  'user=' || CAST(user_id AS VARCHAR) AS labels_str,
         |                  epoch_ns(ts) // 1000000 AS tt, props AS vs FROM events)
         |SELECT name, labels_str, $F + (tt - $F) // $Day * $Day AS t,
         |       max_by(vs, tt) AS last_str
         |FROM s WHERE tt BETWEEN $F AND $T
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  )
}
