package graft.sql

import graft.query.{Aggregates, Interpolation, RequestedColumn, SelectParams}

/** Parsed `CHANGES SINCE n [UNTIL m] [WITH PREIMAGES]` statement (r9 —
  * the SQL surface for the CDC feed [[graft.storage.TsdbTable.changes]]
  * exposes; Delta's `table_changes(...)` analog in this dialect's
  * shape). `sinceSeq = 0` means "from the beginning", like the Scala
  * API. */
case class ChangesSpec(sinceSeq: Long, untilSeq: Long = Long.MaxValue,
                       preImages: Boolean = false)

/** Thin translator for the reference's SQL dialect
  * (`pkg/pquerier/sql_parser.go:33-198`) → [[SelectParams]]. Anything
  * richer belongs in plain `spark.sql` — this exists for API parity with
  * `tsdbctl query "select avg(cpu) from tsdb where os=='win' group by host"`.
  *
  * Supported SELECT items (sql_parser.go:57-150): bare metric, `func(metric)`,
  * `interp(metric[, 'tolerance'])`, nested `func(interp(metric[, 'tol']))`,
  * `alias` via AS, `*` wildcard. FROM one table. WHERE passed through with
  * label refs rewritten to `labels['k']` and `__name__` → `name`
  * (querier.go:192). GROUP BY → label list. No HAVING/ORDER/LIMIT/JOIN —
  * same as the reference.
  */
object TsdbSql {

  // FROM is optional in the reference dialect ("select max(cpu) group by
  // host" is valid — the configured table is implied, sql_parser_test.go).
  // `ASOF <seq>` after FROM is a graft extension (r8 time travel — the
  // Delta `VERSION AS OF` shape): the query serves from the table
  // snapshot at that committed batch seq.
  private val Select =
    """(?is)\s*select\s+(.+?)(?:\s+from\s+(\S+))?(?:\s+asof\s+(\d+))?(?:\s+where\s+(.+?))?(?:\s+group\s+by\s+(.+?))?\s*;?\s*""".r

  def parse(sql: String): SelectParams = sql match {
    case Select(cols, _, asof, where, groupBy) =>
      val requested = splitTop(cols).map(parseColumn)
      validate(requested)
      // single-metric (or wildcard) select lists key the engine off
      // name+functions; a multi-metric AGGREGATE list routes through
      // QueryEngine.multiAggregate (one output column per metric×function,
      // reference `getColumnName`, types.go:99)
      val metrics = requested.map(_.metric).distinct
      val name = metrics match {
        case Seq("*") => ""
        case Seq(m) => m
        case _ => "" // multi-metric: engine routes per metric
      }
      SelectParams(
        name = name,
        requestedColumns = requested,
        functions = requested.map(_.function).filter(_.nonEmpty).distinct.mkString(","),
        filter = Option(where).map(translateFilter).getOrElse(""),
        groupBy = Option(groupBy).map(_.split(",").map(_.trim).mkString(",")).getOrElse(""),
        asOfSeq = Option(asof).map { a =>
          val seq =
            try a.toLong catch {
              case _: NumberFormatException => throw new IllegalArgumentException(
                s"ASOF $a: sequence literal exceeds Long range")
            }
          // `ASOF 0` would silently alias to "no snapshot" (select() treats
          // asOfSeq=0 as the current view) — reject it at parse time like
          // readRawAsOf rejects the 0 handle, so a currentSeq()==0 taken
          // from a manifest-less table fails loudly instead of serving the
          // current view under a snapshot-looking query
          if (seq <= 0) throw new IllegalArgumentException(
            s"ASOF $seq is not a valid snapshot handle (committed seqs start at 1)")
          seq
        }.getOrElse(0L))
    case _ =>
      throw new IllegalArgumentException(s"unsupported query: $sql")
  }

  // `CHANGES SINCE <seq> [UNTIL <seq>] [WITH PREIMAGES]` — the CDC
  // statement (graft extension; the ASOF discipline applied to the
  // change feed so it is reachable without the Scala API)
  private val Changes =
    """(?is)\s*changes\s+since\s+(\d+)(?:\s+until\s+(\d+))?(\s+with\s+preimages)?\s*;?\s*""".r

  /** `HISTORY` — the version-store introspection statement (graft
    * extension, Delta `DESCRIBE HISTORY` shaped): the commit manifest as
    * rows, so snapshot handles for `ASOF` / `CHANGES SINCE` are
    * discoverable without the Scala API. */
  private val History = """(?is)\s*history\s*;?\s*""".r

  /** True iff `sql` is the HISTORY statement (→ route to
    * [[graft.storage.TsdbTable.history]]). */
  def parseHistory(sql: String): Boolean = History.matches(sql)

  /** Parse a CHANGES statement; None when `sql` is not one (→ try
    * [[parse]]). An inverted window is a user error worth failing at
    * parse time — the engine would just return an empty feed, which a
    * CDC consumer reads as "no changes" and silently falls behind. */
  def parseChanges(sql: String): Option[ChangesSpec] = sql match {
    case Changes(since, until, pre) =>
      // (\d+) admits literals beyond Long range — surface them as the
      // same parse-time error class as the window checks, not a raw
      // NumberFormatException with no statement context
      def seqLit(d: String, what: String): Long =
        try d.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"CHANGES $what $d: sequence literal exceeds Long range")
        }
      val s = seqLit(since, "SINCE")
      val u = Option(until).map(seqLit(_, "UNTIL")).getOrElse(Long.MaxValue)
      if (u <= s) throw new IllegalArgumentException(
        s"CHANGES SINCE $s UNTIL $u is an empty/inverted window (UNTIL must exceed SINCE)")
      Some(ChangesSpec(s, u, pre != null))
    case _ => None
  }

  /** Split a select list on top-level commas (not inside parens). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case ',' if depth == 0 => out += cur.result().trim; cur.clear()
      case c =>
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        cur += c
    }
    out += cur.result().trim
    out.result().filter(_.nonEmpty)
  }

  private val FuncCall = """(?s)(\w+)\s*\((.*)\)""".r
  private val AliasRe = """(?is)(.*?)\s+as\s+(\w+)\s*""".r

  /** One select item → RequestedColumn (sql_parser.go:104-150). */
  private[sql] def parseColumn(item: String): RequestedColumn = {
    val (bodyStr, alias) = item match {
      case AliasRe(b, a) => (b.trim, a)
      case other => (other.trim, "")
    }
    bodyStr match {
      case FuncCall(fn, inner) if isInterp(fn) =>
        val (metric, tol) = parseInterpArgs(inner)
        RequestedColumn(metric = metric, alias = alias, interpolator = fn, tolerance = tol)
      case FuncCall(fn, inner) =>
        requireAggregate(fn)
        inner.trim match {
          case FuncCall(interp, iargs) if isInterp(interp) =>
            val (metric, tol) = parseInterpArgs(iargs)
            RequestedColumn(metric = metric, function = fn, alias = alias,
              interpolator = interp, tolerance = tol)
          case metric =>
            RequestedColumn(metric = metric.trim, function = fn, alias = alias)
        }
      case metric => RequestedColumn(metric = metric, alias = alias)
    }
  }

  private def isInterp(fn: String): Boolean =
    Interpolation.Kinds.contains(fn.toLowerCase) || fn.equalsIgnoreCase("lin")

  private def requireAggregate(fn: String): Unit = {
    val base = SelectParams.stripAll(fn.toLowerCase)
    if (!Aggregates.All.contains(base))
      throw new IllegalArgumentException(s"unknown aggregate function '$fn'")
  }

  private def parseInterpArgs(args: String): (String, Long) =
    splitTop(args) match {
      case Seq(metric) => (metric.trim, 0L)
      case Seq(metric, tol) =>
        (metric.trim, graft.core.TimeUtil.parseDuration(tol.trim.stripPrefix("'").stripSuffix("'")))
      case other =>
        throw new IllegalArgumentException(s"bad interpolator args: $args")
    }

  /** Validation per sql_parser.go:178-198: no duplicate output columns,
    * alias must not equal another column's metric name. */
  private def validate(cols: Seq[RequestedColumn]): Unit = {
    val keys = cols.map(c => (c.metric, c.function.toLowerCase))
    if (keys.distinct.size != keys.size)
      throw new IllegalArgumentException("duplicate column in select list")
    // two columns sharing one alias collide in the output schema
    // (sql_parser_test.go negative cases)
    val aliases = cols.map(_.alias).filter(_.nonEmpty)
    if (aliases.distinct.size != aliases.size)
      throw new IllegalArgumentException(
        s"duplicate alias in select list: ${aliases.diff(aliases.distinct).distinct.mkString(",")}")
    val metrics = cols.map(_.metric).toSet
    cols.foreach { c =>
      if (c.alias.nonEmpty && metrics.contains(c.alias))
        throw new IllegalArgumentException(s"alias '${c.alias}' conflicts with a metric name")
    }
  }

  /** Rewrite the reference filter dialect to a Spark SQL predicate over
    * the sample schema: bare identifiers → `labels['k']`, `__name__` →
    * `name`, `starts(x, 'p')` → `startswith(x, 'p')`. String literals are
    * left untouched. */
  def translateFilter(where: String): String = {
    val token = """'[^']*'|"[^"]*"|==|!=|<=|>=|[A-Za-z_][A-Za-z0-9_.]*|.""".r
    val keywords = Set("and", "or", "not", "true", "false", "in", "is", "null", "like")
    val sb = new StringBuilder
    val toks = token.findAllIn(where).toVector
    toks.zipWithIndex.foreach { case (t, i) =>
      val lower = t.toLowerCase
      val isFuncCall = i + 1 < toks.length && toks(i + 1) == "("
      if (t == "__name__") sb ++= "name"
      else if (t.headOption.exists(c => c.isLetter || c == '_') &&
               !keywords.contains(lower) && !isFuncCall) {
        sb ++= s"labels['$t']"
      } else if (lower == "starts" && isFuncCall) sb ++= "startswith"
      else sb ++= t
    }
    sb.result()
  }
}
