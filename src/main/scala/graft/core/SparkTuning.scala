package graft.core

import org.apache.spark.sql.SparkSession

/** Session tuning shared by every entry point. */
object SparkTuning {

  /** Raise RPC/heartbeat tolerances well past transient whole-VM stalls
    * (hypervisor snapshots park every thread for minutes; with the default
    * 120 s network timeout the local executor is declared dead on wake and
    * the context self-destructs mid-suite). Generous timeouts are safe in
    * local mode — there is no real executor loss to detect — and on a
    * cluster they only delay dead-executor detection. */
  def freezeTolerant(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.network.timeout", "600s")
    .config("spark.executor.heartbeatInterval", "60s")
    .config("spark.rpc.askTimeout", "600s")
    .config("spark.rpc.lookupTimeout", "600s")

  /** Partition count for the EXPLICIT key repartitions placed ahead of
    * non-codegen window / session-window operators (QueryEngine.resample,
    * Sessions.byGap batch branch, Corpus.streamingCurate batch branch —
    * the r15 pattern, guide §2.5): user-specified counts are exempt from
    * AQE's byte-based coalescing, which serialized those compute-heavy
    * stages on small inputs.
    *
    * `max(defaultParallelism, shuffle.partitions)` is the PRODUCTION
    * SIZING FLOOR: a session that sizes `spark.sql.shuffle.partitions`
    * for its data never gets fewer partitions than it configured
    * (spec-pinned — a refactor that drops the max would silently turn
    * the local-parallelism fix into a scale regression), while a local
    * session with a tiny setting still spreads across every core. The
    * trade — these shuffles opt out of AQE small-task coalescing — is
    * deliberate for non-codegen window operators only; do NOT extend
    * the pattern to codegen-friendly aggregates (r15 A/B: it costs
    * map-side-combine efficiency there). */
  def windowPartitions(spark: SparkSession): Int =
    math.max(spark.sparkContext.defaultParallelism,
      spark.sessionState.conf.numShufflePartitions)
}
