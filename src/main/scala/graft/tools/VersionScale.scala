package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale receipts for the version store (SCALE.md): stages a TsdbTable
  * from a (possibly ScaleGen-replicated) events corpus as EIGHT
  * time-sliced committed generations plus one narrow UPDATE generation,
  * then times the three versioned-read shapes the r8/r9 features added:
  *
  *  - `cdc_tip`    — a CDC poll for the last (narrow) generation:
  *                   `changes(tipSeq, preImages=true)`. The contract is
  *                   touched-files-bounded cost (the `__seq` window is a
  *                   PushedFilter on a constant-per-file column), so this
  *                   should NOT grow with table size.
  *  - `snap_raw`   — a full-range raw snapshot read at the mid-stage seq:
  *                   `readRawAsOf`. Full-scan shape; grows with the data
  *                   visible at the handle (the honest linear row).
  *  - `asof_agg`   — an ASOF aggregate (`count,sum,min,max` per day) at a
  *                   snapshot taken BEFORE the update: rollup-at-snapshot
  *                   serves untouched partitions from the live rollup and
  *                   rebuilds only the touched ones from raw, so this
  *                   should track rollup-scan cost, not raw-scan cost.
  *
  * Stock-Bench method: one untimed warm-up, three timed runs, min
  * reported, per-run arrays kept (this VM freeze-stalls randomly; see
  * SCALE.md). One JSON line on stdout.
  *
  * Usage: runMain graft.tools.VersionScale <sfDir> [outTag]
  */
object VersionScale {
  private val F = 1704067200000L
  private val Hour = 3600000L
  private val Day = 86400000L

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: VersionScale <sfDir> [tag]")
    val sfDir = args(0)
    val tag = if (args.length > 1) args(1) else sfDir
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.SparkTuning.freezeTolerant(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_version_scale")
    try {
      val samples = graft.core.Samples.fromEvents(spark, sfDir)
        .drop("valueStr").cache()
      val nRows = samples.count()
      val t = new graft.storage.TsdbTable(spark, s"$dir/table",
        graft.storage.TsdbConfig(rollupIntervalMs = 6 * Hour,
          overrideOld = true))

      val t0 = System.nanoTime()
      for (i <- 0 until 8)
        t.append(samples.filter(col("time") >= F + i * 4 * Day &&
          col("time") < F + (i + 1) * 4 * Day))
      val midSeq = t.currentSeq() // after all 8: snapshot BEFORE the update
      // one narrow UPDATE generation: the realistic CDC-poll delta —
      // small override on a big table (clicks of one day, +100)
      t.append(samples
        .filter(col("name") === "click" &&
          col("time").between(F + 3 * Day, F + 4 * Day - 1))
        .withColumn("value", col("value") + 100))
      val stageSec = (System.nanoTime() - t0) / 1e9
      samples.unpersist()

      def timed(body: => org.apache.spark.sql.DataFrame): Seq[Double] = {
        def once(): Double = {
          val s0 = System.nanoTime()
          body.write.mode("overwrite").format("noop").save()
          spark.sharedState.cacheManager.clearCache()
          (System.nanoTime() - s0) / 1e9
        }
        once() // warm-up, untimed
        Seq.fill(3)(once())
      }

      val p = graft.query.SelectParams(functions = "count,sum,min,max",
        from = F, to = F + 32 * Day, step = Day)
      require(t.canServerAggregate(p), "asof_agg must engage the rollup planner")

      val cdcTip = timed(t.changes(midSeq, preImages = true))
      val snapRaw = timed(t.readRawAsOf(F, F + 32 * Day, midSeq))
      val asofAgg = timed(t.selectAsOf(p, midSeq))

      def j(name: String, runs: Seq[Double]): String =
        s""""$name":{"min":${runs.min},"runs":[${runs.mkString(",")}]}"""
      // the LAST line is the artifact (driver tail-capture convention)
      println(s"""{"tool":"version_scale","tag":"$tag","rows":$nRows,""" +
        s""""stage_sec":$stageSec,${j("cdc_tip", cdcTip)},""" +
        s"""${j("snap_raw", snapRaw)},${j("asof_agg", asofAgg)}}""")
    } finally graft.core.Fs.rmTree(dir.toFile)
  }
}
