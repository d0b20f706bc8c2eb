package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{SchemaJson, TimeUtil}
import graft.io.Formatters
import graft.query.{QueryEngine, SelectParams}
import graft.sql.TsdbSql
import graft.storage.{TsdbConfig, TsdbTable}

/** tsdbctl-equivalent CLI (reference `pkg/tsdbctl/` — create/add/query/
  * delete/info with the same flag vocabulary).
  *
  * {{{
  * graft.cli.Main create -t /path [--rollup 1h] [--aggregates count,sum,...]
  * graft.cli.Main add    -t /path <metric> [k1=v1,k2=v2] -d v1[:v2..] [-m t1[:t2..]]
  * graft.cli.Main add    -t /path -f samples.csv
  * graft.cli.Main query  -t /path [<sql> | -n metric -a funcs] \
  *                       [-b from] [-e to] [-l last] [-i step] [-f filter] \
  *                       [--use-precise-aggregations] [-o text|csv|json]
  * graft.cli.Main delete -t /path -b from -e to [-n metric,metric] [-f filter]
  * graft.cli.Main info   -t /path
  * }}}
  */
object Main {

  /** Reference long-form flag names → our short keys (cobra exposes both;
    * reading only the short key would silently ignore `--last 1d`). */
  private val LongForms = Map(
    "begin" -> "b", "end" -> "e", "last" -> "l", "filter" -> "f",
    "output" -> "o", "aggregates" -> "a", "name" -> "n",
    "aggregation-interval" -> "i", "aggregation-window" -> "w",
    "ingestion-rate" -> "r", "aggregation-granularity" -> "rollup",
    "cross-label" -> "pre-aggregates")

  /** Value-less flags: must NOT consume the next token (a following
    * positional — e.g. the SQL string — would silently become the value). */
  private val BoolFlags = Set("use-precise-aggregations", "v1-avg")

  private[graft] def flags(args: Seq[String]): (Map[String, String], Seq[String]) = {
    def isFlag(a: String) =
      a.startsWith("-") && a.length > 1 && !a.drop(1).forall(c => c.isDigit || c == '.')
    val m = Map.newBuilder[String, String]
    val pos = Seq.newBuilder[String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (isFlag(a)) {
        val name = a.replaceAll("^-+", "")
        val key = LongForms.getOrElse(name, name)
        // never consume another FLAG as this flag's value — `-n -a sum`
        // would otherwise silently query a metric named "-a"
        val v =
          if (BoolFlags.contains(key)) ""
          else if (i + 1 < args.length && !isFlag(args(i + 1))) { i += 1; args(i) }
          else ""
        m += key -> v
      } else pos += a
      i += 1
    }
    (m.result(), pos.result())
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: <create|add|query|delete|info|check|time|version> -t <table> ..."); sys.exit(2) }
    val cmd = args.head
    val (f, pos) = flags(args.tail.toSeq)
    // table-less commands run without a Spark session (reference tsdbctl
    // time, time.go: RFC3339 <-> unix conversions; version, version.go)
    cmd match {
      case "time" =>
        val now = System.currentTimeMillis()
        val t = pos.headOption.map(TimeUtil.parseTime(_, now)).getOrElse(now)
        println(s"unix-ms: $t")
        println(s"rfc3339: ${java.time.Instant.ofEpochMilli(t)}")
        return
      case "version" =>
        println("v3iotsdbspark 0.1.0")
        return
      case _ =>
    }
    val tablePath = f.getOrElse("t", sys.error("missing -t <table-path>"))

    val spark = graft.core.SparkTuning.freezeTolerant(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(cmd, spark, tablePath, f, pos)
    finally spark.stop()
  }

  // readCached = the reference's mtime-checked schema reload
  // (ReadAndUpdateSchema): repeated invocations in one JVM re-parse the
  // .schema only when it actually changed, and DO see edits when it did
  private def table(spark: SparkSession, path: String): TsdbTable =
    new TsdbTable(spark, path, SchemaJson.readCached(path).getOrElse(
      // a silent default here would let a typo'd path masquerade as a new
      // table (the reference tsdbctl errors on a missing table)
      sys.error(s"no table at $path (no ${SchemaJson.FileName}; run `create` first)")))

  private[graft] def run(cmd: String, spark: SparkSession, tablePath: String,
                         f: Map[String, String], pos: Seq[String]): Unit = cmd match {
    case "create" =>
      // reference create shorthands (create.go): -i = aggregation
      // granularity, -l = cross-label — same letters mean step/last on
      // `query`, so resolve them per command here
      val cfg = TsdbConfig(
        rollupIntervalMs = f.get("rollup").orElse(f.get("i"))
          .map(TimeUtil.parseDuration).getOrElse(3600000L),
        // -r "1/s" derives the partition interval from the declared
        // ingestion rate (reference create -r, schema.go:136-196); an
        // explicit --partition wins
        partitionIntervalMs = f.get("partition").map(TimeUtil.parseDuration)
          .orElse(f.get("r").map(graft.core.SchemaDerivation.derivePartitionIntervalMs))
          .getOrElse(86400000L),
        // --aggregates normalizes to "a" via LongForms; accept the raw
        // long key too for programmatic run() callers
        aggregates = f.get("a").orElse(f.get("aggregates")).map(_.split(",").toSeq)
          .getOrElse(graft.storage.Rollup.DefaultAggregates),
        preAggregates = f.get("pre-aggregates").orElse(f.get("l"))
          .map(_.split(";").toSeq.map(_.split(",").toSeq))
          .getOrElse(Nil))
      SchemaJson.write(tablePath, cfg)
      println(s"created table at $tablePath")

    case "add" =>
      val t = table(spark, tablePath)
      val now = System.currentTimeMillis()
      val df = f.get("f") match {
        case Some(csv) => graft.ingest.CsvSource.read(spark, csv, now)
        case None =>
          val metric = pos.headOption.getOrElse(sys.error("missing metric name"))
          val labels = pos.drop(1).headOption.getOrElse("")
          import spark.implicits._
          graft.ingest.CsvSource.fromColumns(
            Seq((metric, labels, f.getOrElse("d", sys.error("missing -d <value>")),
              f.getOrElse("m", ""))).toDF("name", "labels", "value", "time"), now)
      }
      // one pass for the accounting: count total + valid together
      df.persist()
      try {
        val Array(total, ok) = df.agg(
          count(lit(1)),
          count(when(col("time").isNotNull &&
            col("time").between(TimeUtil.MinTimeMs, TimeUtil.MaxTimeMs), 1)))
          .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
        t.append(df)
        println(s"appended $ok samples" +
          (if (ok < total) s" (${total - ok} dropped: invalid/unparseable time)" else ""))
      } finally df.unpersist()

    // version-store introspection (r9): `history` prints the commit
    // manifest rows — where the handles ASOF / CHANGES SINCE consume
    // come from, so the whole time-travel loop closes inside the CLI
    case "query" if pos.headOption.exists(TsdbSql.parseHistory) =>
      val t = table(spark, tablePath)
      // not a series frame (the formatters' shape) — print the manifest
      // rows directly, matching each -o mode's conventions (csv with a
      // header row, text aligned); bounded by the vacuum threshold
      val rows = t.history().orderBy("kind", "seq").collect()
      f.getOrElse("o", "text") match {
        case "json" => println(rows.map(r =>
          s"""{"kind":"${r.getString(0)}","seq":${r.getLong(1)}}""")
          .mkString("[", ",", "]"))
        case "csv" =>
          println("kind,seq")
          rows.foreach(r => println(s"${r.getString(0)},${r.getLong(1)}"))
        case _ =>
          rows.foreach(r => println(f"${r.getString(0)}%-8s ${r.getLong(1)}"))
      }

    // CDC statement (r9): `changes since <seq> [until <seq>] [with
    // preimages]` emits the change feed through the chosen formatter and
    // takes none of the SELECT-path time flags (its window is commit
    // seqs, not sample time)
    case "query" if pos.headOption.exists(_.trim.toLowerCase.startsWith("changes")) =>
      val t = table(spark, tablePath)
      val c = TsdbSql.parseChanges(pos.head).getOrElse(
        sys.error(s"unsupported CHANGES statement: ${pos.head}"))
      val feed = t.changes(c.sinceSeq, c.untilSeq, c.preImages)
        .select(col("name"), col("labels_str"), col("time"), col("value"),
          col("_change_type"))
        .orderBy("name", "labels_str", "time", "_change_type")
      f.getOrElse("o", "text") match {
        case "csv" => print(Formatters.csv(feed))
        case "json" => println(Formatters.json(feed))
        case _ => print(Formatters.text(feed))
      }

    case "query" =>
      val t = table(spark, tablePath)
      val now = System.currentTimeMillis()
      val base = pos.headOption.filter(_.toLowerCase.startsWith("select"))
        .map(TsdbSql.parse)
        .getOrElse(SelectParams(name = f.getOrElse("n", ""), functions = f.getOrElse("a", "")))
      // the reference rejects -l together with -b/-e (query.go:131-168);
      // silently combining them would produce a wrong (or inverted) window
      if (f.contains("l") && (f.contains("b") || f.contains("e")))
        sys.error("the -l|--last flag cannot be set together with -b and/or -e")
      val toMs = f.get("e").map(TimeUtil.parseTime(_, now)).getOrElse(now)
      val p = base.copy(
        // -l/--last "1d" = the trailing window ending at `to` (query.go:102)
        from = f.get("l").map(d => toMs - TimeUtil.parseDuration(d))
          .orElse(f.get("b").map(TimeUtil.parseTime(_, now)))
          .getOrElse(toMs - TimeUtil.MillisInHour),
        to = toMs,
        step = f.get("i").map(TimeUtil.parseDuration).getOrElse(base.step),
        // -f speaks the reference filter dialect on every subcommand
        // (delete translates too) — bare identifiers are label refs
        filter = if (base.filter.nonEmpty) base.filter
          else f.get("f").map(TsdbSql.translateFilter).getOrElse(""),
        aggregationWindow = f.get("w").map(TimeUtil.parseDuration).getOrElse(0L),
        usePreciseAggregations = f.contains("use-precise-aggregations"))
      // --v1-avg: legacy-querier sugar (querier.go:199-206) — an
      // aggregate-less query with step >= rollup implicitly averages;
      // the default path keeps v2 downsample semantics
      val pv = if (f.contains("v1-avg"))
        SelectParams.v1ImplicitAvg(p, t.config.rollupIntervalMs, t.config.aggregates)
      else p
      val wide = t.select(pv)
      val out =
        if (pv.baseFunctions.nonEmpty) {
          // melt by the ACTUAL output columns — aliases may have renamed
          // the aggregate columns
          val keys = wide.columns.takeWhile(_ != "t").toSeq
          val valueCols = wide.columns.dropWhile(_ != "t").drop(1).toSeq
          QueryEngine.toSeriesSet(wide, keys, valueCols)
        } else wide
      f.getOrElse("o", "text") match {
        case "csv" => print(Formatters.csv(out))
        case "json" => println(Formatters.json(out))
        case _ => print(Formatters.text(out))
      }

    case "delete" =>
      val t = table(spark, tablePath)
      val now = System.currentTimeMillis()
      // -n metric[,metric...]; -f label filter in the reference dialect
      // (tsdbctl delete flags — delete.go)
      t.delete(
        f.get("b").map(TimeUtil.parseTime(_, now)).getOrElse(0L),
        f.get("e").map(TimeUtil.parseTime(_, now)).getOrElse(now),
        f.get("n").toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
        f.get("f").map(graft.sql.TsdbSql.translateFilter).getOrElse(""))
      println("deleted")

    case "info" =>
      val t = table(spark, tablePath)
      println(s"table: $tablePath")
      println(s"config: ${t.config}")
      println(s"samples: ${t.countMetrics()}")
      println(s"metrics: ${t.names().collect().map(_.getString(0)).mkString(", ")}")

    // item inspector (reference S13, `tsdbctl check` — check.go:116-332):
    // dump one series' raw samples + its rollup cells
    case "check" =>
      val t = table(spark, tablePath)
      val metric = pos.headOption.getOrElse(sys.error("missing metric name"))
      val labels = pos.drop(1).headOption.getOrElse("")
      val raw = t.readRaw(0L, Long.MaxValue / 2)
        .filter(col("name") === metric &&
          (if (labels.isEmpty) lit(true) else col("labels_str") === labels))
        .orderBy("time")
        .cache() // count + show share one scan of the filtered series
      try {
        println(s"series: $metric{$labels}  samples=${raw.count()}")
        raw.select("time", "value", "valueStr").show(f.getOrElse("limit", "20").toInt, false)
      } finally raw.unpersist()
      t.readRollup()
        .filter(col("name") === metric &&
          (if (labels.isEmpty) lit(true) else col("labels_str") === labels))
        .orderBy("bucket_start").show(20, false)

    case other => sys.error(s"unknown command '$other'")
  }
}
