package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query execution-shape profiler (guide §1: measure first). For each
  * named SparkEntry query it runs the same noop-sink body the bench times
  * and reports, from a SparkListener: wall seconds, #jobs, #stages,
  * #tasks, executor CPU seconds, shuffle read/write bytes, input bytes,
  * and spill. The shape numbers (jobs/stages/shuffle bytes) are what the
  * bench's single wall number can't show: a 2 s query that runs 14 jobs
  * or shuffles its payload twice is an algorithm problem, not a constant.
  * Diagnostic only — not part of the driver contract. Usage:
  *   runMain graft.tools.QueryProfile <query> [query ...]
  * (sf dir from SPARK_GRAFT_SF_DIR, default sf0.1; cores from
  * SPARK_GRAFT_CPUS, default 32 — same session shape as Bench.)
  */
object QueryProfile {

  private class Metrics {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val cpuNs = new AtomicLong
    val runNs = new AtomicLong
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    val input = new AtomicLong
    val spillDisk = new AtomicLong
    val gcMs = new AtomicLong
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); cpuNs.set(0); runNs.set(0)
      shufRead.set(0); shufWrite.set(0); input.set(0); spillDisk.set(0); gcMs.set(0)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = graft.core.SparkTuning.freezeTolerant(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
    // A/B experiment knob: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" — lets a
    // hypothesis ("bigger heap", "smaller AQE min partition size") be
    // tested without touching the bench contract session.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { s =>
      s.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b = b.config(k, v)
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val m = new Metrics
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        m.jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        m.stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        m.tasks.incrementAndGet()
        val tm = e.taskMetrics
        if (tm != null) {
          m.cpuNs.addAndGet(tm.executorCpuTime)
          m.runNs.addAndGet(tm.executorRunTime * 1000000L)
          m.shufRead.addAndGet(tm.shuffleReadMetrics.totalBytesRead)
          m.shufWrite.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
          m.input.addAndGet(tm.inputMetrics.bytesRead)
          m.spillDisk.addAndGet(tm.diskBytesSpilled)
          m.gcMs.addAndGet(tm.jvmGCTime)
        }
      }
    })

    def run(name: String): Unit =
      try graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      finally spark.sharedState.cacheManager.clearCache()

    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    // one untimed warm-up of each query (codegen/classload), same as Bench
    names.foreach { n =>
      try run(n)
      catch { case e: Throwable => System.err.println(s"[prof] warmup $n: $e") }
    }
    println(f"${"query"}%-28s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"cpu_s"}%7s ${"run_s"}%7s ${"shR_MB"}%7s ${"shW_MB"}%7s ${"in_MB"}%7s ${"gc_ms"}%6s")
    names.foreach { n =>
      // two measured passes, report the second (min would hide job count)
      val walls = (1 to 2).map { _ =>
        m.reset()
        val t0 = System.nanoTime()
        try run(n)
        catch { case e: Throwable => System.err.println(s"[prof] $n: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      // listener events race task end; give the bus a beat to drain.
      // walls.last (not min): the counters are reset each pass, so the
      // printed wall must come from the same pass as the shape numbers
      Thread.sleep(200)
      println(f"$n%-28s ${walls.last}%7.3f ${m.jobs.get}%5d ${m.stages.get}%6d ${m.tasks.get}%6d ${m.cpuNs.get / 1e9}%7.2f ${m.runNs.get / 1e9}%7.2f ${m.shufRead.get / 1e6}%7.1f ${m.shufWrite.get / 1e6}%7.1f ${m.input.get / 1e6}%7.1f ${m.gcMs.get}%6d")
    }
    spark.stop()
  }
}
