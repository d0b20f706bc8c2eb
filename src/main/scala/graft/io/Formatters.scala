package graft.io

import org.apache.spark.sql.DataFrame

/** Output serializers over a long-format SeriesSet frame
  * `(name, labels_str, [aggregate,] t, v)` — reference S10,
  * `pkg/formatter/formatters.go:38-196` (text / csv / Grafana simpleJSON).
  * These collect to the driver — they are CLI/endpoint emitters for query
  * RESULTS (already aggregated/small), not data-path operators. */
object Formatters {

  private case class SeriesRow(key: String, t: Long, v: Double)

  private def seriesOf(df: DataFrame): Seq[(String, Seq[(Long, Double)])] = {
    val cols = df.columns
    val tIdx = cols.indexOf("t")
    // value column: "v" if present, else the LAST double-typed column (an
    // alias may have renamed it); vstr is payload, not a series key
    val vIdx =
      if (cols.contains("v")) cols.indexOf("v")
      else cols.lastIndexWhere(c =>
        df.schema(c).dataType == org.apache.spark.sql.types.DoubleType)
    if (tIdx < 0 || vIdx < 0)
      throw new IllegalArgumentException(
        s"formatter expects a long-format series frame (name, labels_str, " +
          s"[aggregate,] t, v) with a long `t` and a double value column; " +
          s"got columns ${cols.mkString("(", ", ", ")")}")
    val keyIdxs = cols.indices.filterNot(i =>
      i == tIdx || i == vIdx || cols(i) == "vstr")
    df.collect().toSeq
      .map { r =>
        val key = keyIdxs.map(i => if (r.isNullAt(i)) "" else r.get(i).toString)
          .filter(_.nonEmpty).mkString("{", ",", "}")
        SeriesRow(key, r.getLong(tIdx), if (r.isNullAt(vIdx)) Double.NaN else
          r.get(vIdx) match { case d: Double => d; case x => x.toString.toDouble })
      }
      .groupBy(_.key).toSeq.sortBy(_._1)
      .map { case (k, rows) => k -> rows.sortBy(_.t).map(r => (r.t, r.v)) }
  }

  /** Aligned text table (formatters.go textFormatter). */
  def text(df: DataFrame): String = {
    val sb = new StringBuilder
    seriesOf(df).foreach { case (key, points) =>
      sb.append(s"Name: $key\n")
      points.foreach { case (t, v) =>
        sb.append(f"  ${java.time.Instant.ofEpochMilli(t)}  $v%s\n")
      }
      sb.append('\n')
    }
    sb.result()
  }

  /** `series,time,value` CSV lines (formatters.go csvFormatter). */
  def csv(df: DataFrame): String = {
    val sb = new StringBuilder
    seriesOf(df).foreach { case (key, points) =>
      val quoted = "\"" + key.replace("\"", "\"\"") + "\"" // RFC-4180 escaping
      points.foreach { case (t, v) => sb.append(s"$quoted,$t,$v\n") }
    }
    sb.result()
  }

  /** Grafana simpleJSON: `[{"target": "...", "datapoints": [[v, t], ...]}]`
    * (formatters.go simpleJsonFormatter). */
  def json(df: DataFrame): String =
    seriesOf(df).map { case (key, points) =>
      val dps = points.map { case (t, v) =>
        // NaN AND ±Infinity are not valid JSON tokens
        val vs = if (v.isNaN || v.isInfinite) "null" else v.toString
        s"[$vs,$t]"
      }.mkString("[", ",", "]")
      s"""{"target":${quote(key)},"datapoints":$dps}"""
    }.mkString("[", ",", "]")

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
