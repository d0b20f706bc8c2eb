package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch CSV ingestion (reference S6, `tsdbctl add -f file.csv` —
  * `pkg/tsdbctl/add.go:200-328`).
  *
  * Line format: `name,labels,value[,time]` where `labels` is the canonical
  * `k1=v1,k2=v2` serialization (quoted in the CSV), `value` may be a
  * `:`-separated array paired with a `:`-separated `time` array (the
  * reference's multi-sample lines), and a missing time means "now"
  * (add.go:255-259). Non-numeric values become variant (string) samples
  * (add.go:281-287).
  */
object CsvSource {

  /** Read a CSV of samples into the canonical sample schema
    * (`name, labels, time, value, valueStr`). */
  def read(spark: SparkSession, path: String, nowMs: Long = System.currentTimeMillis()): DataFrame = {
    val raw = spark.read
      .option("header", "false")
      .option("quote", "\"")
      .csv(path)
    fromColumns(
      raw.toDF(Seq("name", "labels", "value", "time").take(raw.columns.length): _*),
      nowMs)
  }

  /** Same parsing over an already-loaded DataFrame with string columns
    * (name, labels, value[, time]). */
  def fromColumns(df: DataFrame, nowMs: Long): DataFrame = {
    val withTime = if (df.columns.contains("time")) df else df.withColumn("time", lit(null))
    // explode `v1:v2:v3` / `t1:t2:t3` arrays position-wise (add.go:300-326);
    // only a NUMERIC colon list is a time array — ISO timestamps contain
    // colons and must stay whole
    val exploded = withTime
      // NULL value (empty CSV field) is a variant "" sample in the
      // reference — posexplode of a NULL array would drop the row silently
      .withColumn("__vs", split(coalesce(col("value"), lit("")), ":"))
      .withColumn("__ts",
        when(col("time").isNull || col("time") === "", array(lit(nowMs.toString)))
          .when(col("time").rlike("^[0-9]+(:[0-9]+)+$"), split(col("time"), ":"))
          .otherwise(array(col("time"))))
      .select(col("name"), col("labels"),
        posexplode(col("__vs")).as(Seq("__i", "__v")), col("__ts"))
      // try_element_at: a line with more values than times must not abort
      // the whole ingest under ANSI mode — its excess samples parse to NULL
      // time and are surfaced by the validity filter instead
      .withColumn("__t", expr("try_element_at(__ts, __i + 1)"))
    // try_cast: ANSI mode errors on a plain cast of non-numeric strings —
    // those are exactly the variant samples (add.go:281-287)
    val num = expr("try_cast(__v AS DOUBLE)")
    exploded.select(
      col("name"),
      graft.core.Labels.parse(coalesce(col("labels"), lit(""))).as("labels"),
      parseTimeCol(col("__t"), nowMs).as("time"),
      num.as("value"),
      when(num.isNull, col("__v")).as("valueStr"))
  }

  /** `now`, `now-2h`, unix-ms digits — the CLI time dialect
    * (`timeutils.go:80-112`), vectorized. Relative offsets are bounded to
    * the duration grammar `[0-9]+[smhd]`. */
  private[ingest] def parseTimeCol(t: org.apache.spark.sql.Column, nowMs: Long) = {
    val dur = regexp_extract(t, "^now([+-])([0-9]+)([smhd])$", 2).cast("long")
    val unit = regexp_extract(t, "^now([+-])([0-9]+)([smhd])$", 3)
    val sign = when(regexp_extract(t, "^now([+-])", 1) === "-", -1L).otherwise(1L)
    val unitMs = when(unit === "s", 1000L).when(unit === "m", 60000L)
      .when(unit === "h", 3600000L).when(unit === "d", 86400000L)
    // absent time is defaulted to [now] upstream; a NULL here is an array
    // overflow (more values than times) and must STAY null, not become now
    when(t === "now", lit(nowMs))
      .when(t.rlike("^now[+-][0-9]+[smhd]$"), lit(nowMs) + sign * dur * unitMs)
      .when(t.rlike("^[0-9]+$"), t.cast("long"))
      // ISO-8601/RFC3339 (timeutils.go:80-112); try the string as-is and
      // with the T/Z designators stripped (UTC session) — anything else
      // stays NULL and is reported by the caller's validity accounting
      .otherwise(unix_millis(coalesce(
        try_to_timestamp(t),
        try_to_timestamp(trim(translate(t, "TZ", "  "))))))
  }
}
