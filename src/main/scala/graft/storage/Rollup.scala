package graft.storage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.query.{Aggregates, QueryEngine}

/** Rollup (pre-aggregate) table builder (reference A1 — ingest-time rollup
  * arrays `_v_<aggr>[bucket]`, `pkg/aggregate/aggregate.go:188-264` +
  * `pkg/appender/store.go:323-401`).
  *
  * The reference stores per-partition arrays of partial aggregates per
  * series at `rollupTime` granularity; here the same partials live in a
  * columnar rollup table keyed `(name, labels_str, bucket_start)` — the
  * classic materialized partial-aggregate view. [[QueryEngine.serverAggregate]]
  * merges these to any coarser step (A2), which at 100 TB turns a
  * full-raw-scan query into a scan of `span/rollupInterval` rows per series.
  *
  * Buckets are epoch-aligned (`floor(t/rollup)*rollup`) — equivalent to the
  * reference's partition-relative cells because its partitions are themselves
  * epoch-aligned multiples of the rollup interval (`partmgr.go:366-368`).
  */
object Rollup {

  /** All six raw partials — what `schema.NewSchema` defaults to materializing. */
  val DefaultAggregates: Seq[String] = Aggregates.RawAggregates

  /** Build the rollup table from a samples DataFrame
    * (`name, labels, time, value, ...`). One shuffle on
    * (series, bucket) with map-side combine. */
  def build(samples: DataFrame, rollupIntervalMs: Long,
            aggregates: Seq[String] = DefaultAggregates): DataFrame = {
    val v = QueryEngine.cleanValue(col("value"))
    val bucket = (floor(col("time") / lit(rollupIntervalMs)).cast("long") * lit(rollupIntervalMs))
      .as("bucket_start")
    val withLs =
      if (samples.columns.contains("labels_str")) samples
      else samples.withColumn("labels_str", graft.core.Labels.canonical(col("labels")))
    val partials = ("count" +: aggregates).distinct
    withLs
      .groupBy(col("name"), col("labels_str"), bucket)
      .agg(
        Aggregates.partialExpr(partials.head, v, col("time")).as("__p_" + partials.head),
        partials.tail.map(f => Aggregates.partialExpr(f, v, col("time")).as("__p_" + f)): _*)
  }
}
