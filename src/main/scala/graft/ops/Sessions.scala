package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gap-based sessionization — a session-window operator the reference
  * lacks entirely (SURVEY §2.9 T6 "absent") but every event/clickstream
  * training pipeline needs.
  *
  * Spark-first shape: the native `session_window` aggregate, which works
  * identically over batch DataFrames and Structured Streaming (with a
  * watermark) and keeps session state inside ONE mergeable aggregate —
  * a hand-rolled lag/gap-island needs a full per-key sort window plus a
  * second aggregate, costs an extra shuffle, and has no streaming form.
  *
  * Semantics (and the DuckDB oracle twin's gap-island encoding): each
  * event spans `[t, t+gap]`; overlapping or TOUCHING spans merge, so a
  * new session starts exactly when `t - prev_t > gap` (an event exactly
  * `gap` after the previous one still extends the session — verified
  * against Spark 4.1 behavior in SessionsSpec). `session_end` is
  * `last event + gap`.
  */
object Sessions {

  /** Sessions per key: `(key, session_start, session_end, n_events,
    * sum_v)`. One aggregate, one shuffle on the key. Batch output is
    * ordered; a STREAMING input skips the sort (Spark rejects orderBy on
    * unbounded frames outside complete mode — the aggregate itself is
    * identical).
    *
    * `time` may be a unix-ms long (wrapped in `timestamp_millis`) or an
    * existing timestamp column. Streaming inputs MUST pass the
    * WATERMARKED timestamp column itself — a watermark attaches to a
    * column, and wrapping the long in a fresh `timestamp_millis`
    * expression would sever it (append mode then rejects the plan). */
  def byGap(df: DataFrame, key: Column, time: Column, value: Column,
            gapMs: Long): DataFrame = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    val isTs = df.select(time).schema.head.dataType ==
      org.apache.spark.sql.types.TimestampType
    val eventTime = if (isTs) time else timestamp_millis(time)
    // BATCH path: explicit key-keyed repartition ahead of the session
    // aggregate (r15, the QueryEngine.resample rationale): session-window
    // merge is sort-based, compute-heavy per byte, and AQE's byte-based
    // coalescing serialized it on small shuffles; a user-specified count
    // satisfies the aggregate's ClusteredDistribution(key), adds no
    // second exchange, and is floored at the configured shuffle
    // partitions so production sizing wins at scale. Streaming inputs
    // keep Spark's own stateful partitioning untouched.
    val in =
      if (df.isStreaming) df
      else df.repartition(
        graft.core.SparkTuning.windowPartitions(df.sparkSession), key)
    val sessions = in.groupBy(key.as("key"),
        session_window(eventTime, s"$gapMs milliseconds").as("__w"))
      .agg(count(lit(1)).as("n_events"), sum(value).as("sum_v"))
      .select(col("key"),
        unix_millis(col("__w.start")).as("session_start"),
        unix_millis(col("__w.end")).as("session_end"),
        col("n_events"), col("sum_v"))
    if (df.isStreaming) sessions else sessions.orderBy("key", "session_start")
  }
}
