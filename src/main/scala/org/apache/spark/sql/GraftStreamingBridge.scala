package org.apache.spark.sql

/** V1 streaming-source bridge (r11): `Source.getBatch` must return a
  * DataFrame whose logical plan carries `isStreaming = true` — the
  * engine asserts it — and the ONLY constructor that sets the flag,
  * `SparkSession.internalCreateDataFrame`, is `private[sql]`. This
  * one-method splice into Spark's package is the established pattern
  * for out-of-tree V1 sources (Delta's DeltaSource calls the same
  * method from its own sql-package shim); everything else about
  * graft's source lives in `graft.streaming`.
  *
  * The input frame's physical RDD is taken lazily
  * (`queryExecution.toRdd` plans but does not run), so the batch still
  * executes on the cluster when the micro-batch does. */
object GraftStreamingBridge {
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }
}
