package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale receipts for the CDC multi-view maintainer (SCALE.md): stages
  * a TsdbTable from a (possibly ScaleGen-replicated) events corpus as
  * FOUR time-sliced committed generations, folds them into three views
  * (day-bucket rollup replica, per-series moment stats, refcounted
  * registry) through ONE [[graft.streaming.ChangesStream.MultiViewMaintainer]],
  * then measures the two claims the design makes:
  *
  *  - `init_fold`   — the initial-corpus window into all three views:
  *                    the honest linear row (every view folds every row
  *                    once; cost tracks data volume).
  *  - `narrow_fold` — five successive NARROW update windows (one day of
  *                    clicks, +i) through the same maintainer, each
  *                    timed separately. The contract is |state| +
  *                    |window| cost with NO history term: the per-window
  *                    times must stay FLAT as windows accumulate (a
  *                    design that replayed history would grow), and
  *                    grow with table size only through |state|.
  *
  * Method as VersionScale: per-run wall times kept (this VM
  * freeze-stalls randomly), one JSON line last on stdout.
  *
  * Usage: runMain graft.tools.CdcViewScale <sfDir> [outTag]
  */
object CdcViewScale {
  private val F = 1704067200000L
  private val Hour = 3600000L
  private val Day = 86400000L

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CdcViewScale <sfDir> [tag]")
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

    val dir = java.nio.file.Files.createTempDirectory("graft_cdcview_scale")
    try {
      import graft.streaming.ChangesStream
      val samples = graft.core.Samples.fromEvents(spark, sfDir)
        .drop("valueStr").cache()
      val nRows = samples.count()
      val t = new graft.storage.TsdbTable(spark, s"$dir/table",
        graft.storage.TsdbConfig(rollupIntervalMs = 6 * Hour,
          overrideOld = true))
      val t0 = System.nanoTime()
      for (i <- 0 until 4)
        t.append(samples.filter(col("time") >= F + i * 8 * Day &&
          col("time") < F + (i + 1) * 8 * Day))
      val stageSec = (System.nanoTime() - t0) / 1e9

      val feed = new ChangesStream.ChangesFeed(t, s"$dir/ckpt")
      val rollup = new ChangesStream.RollupReplica(spark, s"$dir/rollup", Day)
      val stats = new ChangesStream.SeriesStatsReplica(spark, s"$dir/stats")
      val registry = new ChangesStream.SeriesRegistryReplica(spark, s"$dir/registry")
      val mv = new ChangesStream.MultiViewMaintainer(
        feed, Seq(rollup, stats, registry))

      // initial corpus: the 4 staged generations as one-or-more windows
      val i0 = System.nanoTime()
      val windows0 = mv.drainAll()
      val initSec = (System.nanoTime() - i0) / 1e9
      val stateRows = rollup.state().count()

      // five successive narrow updates (one day of clicks, +i each):
      // per-window fold must be flat — |state| + |window|, no history
      val narrow = (1 to 5).map { i =>
        t.append(samples
          .filter(col("name") === "click" &&
            col("time").between(F + 3 * Day, F + 4 * Day - 1))
          .withColumn("value", col("value") + i))
        val n0 = System.nanoTime()
        require(mv.drainAll() == 1, "one narrow window expected")
        (System.nanoTime() - n0) / 1e9
      }
      samples.unpersist()

      // the maintained state must equal a from-scratch recompute
      val expect = t.readRaw(0L, Long.MaxValue)
        .groupBy(col("name"), col("labels_str"),
          (floor(col("time") / Day) * Day).cast("long").as("t"))
        .agg(count(lit(1)).cast("double").as("count"),
          round(sum("value"), 4).as("sum")) // rounded: fold order differs
      val got = rollup.state()
        .select(col("name"), col("labels_str"), col("t"),
          col("count").cast("double").as("count"), round(col("sum"), 4).as("sum"))
      require(got.count() == expect.count() &&
        got.except(expect).isEmpty && expect.except(got).isEmpty,
        "replica != recompute after the scale run")

      // the LAST line is the artifact (driver tail-capture convention)
      println(s"""{"tool":"cdcview_scale","tag":"$tag","rows":$nRows,""" +
        s""""stage_sec":$stageSec,"init_windows":$windows0,""" +
        s""""init_fold_sec":$initSec,"state_rows":$stateRows,""" +
        s""""narrow_fold_sec":[${narrow.mkString(",")}]}""")
    } finally graft.core.Fs.rmTree(dir.toFile)
  }
}
