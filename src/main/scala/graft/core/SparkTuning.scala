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
}
