package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of selected
  * SparkEntry queries so scan pruning (PushedFilters / PartitionFilters /
  * ReadSchema), broadcast joins and WholeStageCodegen spans can be
  * eyeballed per round. Usage:
  * {{{ sbt "runMain graft.Explain [query ...]" }}}
  * (defaults to a representative subset; sf dir from SPARK_GRAFT_SF_DIR,
  * default sf0.001 so the audit is fast). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.core.SparkTuning.freezeTolerant(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // print the operators' real plans, not InMemoryTableScans over the
    // eagerly-materialized caches Caching.scoped would otherwise build
    graft.ops.Caching.planOnly = true
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("tsdb_raw", "tsdb_client_agg", "tsdb_storage_agg",
        "tsdb_multi_agg", "q3_topk_join", "sim_topk", "events_sessionize",
        "corpus_pack", "text_decontaminate", "corpus_chunk", "corpus_chunk_pack", "text_vocab",
        "dedup_embedding_srp",
        "text_normalize", "corpus_epochs", "corpus_domain_cap", "sim_knn_graph_ivf",
        // r8: PQ ADC probe scan (graft_pq_adc inside codegen, broadcast
        // LUT), cluster-quota sampling (two-phase salted windows),
        // DoReMi mixer (scan-speed md5 threshold)
        "sim_ann_pq", "sim_cluster_sample", "corpus_doremi")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"ERROR: $e") }
    }
    spark.stop()
  }
}
