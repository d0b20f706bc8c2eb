package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main (guide §1): replicate Bench.ingestOnce and print every
  * Spark job the append runs — start offset, wall, description — so the
  * append path's action sequence (cache+enforce probe, registry
  * checkpoint, raw write, rollup merge, names merge) can be attributed.
  * Not part of the driver contract. */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.SparkTuning.freezeTolerant(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val t00 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, (System.nanoTime(),
          Option(e.properties.getProperty("spark.job.description"))
            .orElse(Option(e.properties.getProperty("callSite.short"))).getOrElse("?")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobs.getOrDefault(e.jobId, (0L, "?"))
        println(f"job ${e.jobId}%3d  +${(t0 - t00) / 1e9}%7.2fs  wall=${(System.nanoTime() - t0) / 1e9}%6.3fs  $desc")
      }
    })

    def ingestOnce(tag: String): Double = {
      val dir = java.nio.file.Files.createTempDirectory("graft_ingest_prof")
      val t = new graft.storage.TsdbTable(spark, dir.toString,
        graft.storage.TsdbConfig(rollupIntervalMs = 3600000L))
      val base = 1704067200000L
      val nSeries = 150L
      def idiv(c: org.apache.spark.sql.Column, d: Long) =
        floor(c / d).cast("long")
      val samples = spark.range(nSeries * 11520L).select(
        concat(lit("Name_"), (col("id") % 10).cast("string"),
          lit("_"), (idiv(col("id"), 10) % 5).cast("string")).as("name"),
        map(lit("Label_A"),
          concat(lit("A_"), (idiv(col("id"), 50) % 3).cast("string"))).as("labels"),
        (lit(base) + idiv(col("id"), nSeries) * 30000L).as("time"),
        (col("id") % 997).cast("double").as("value"))
      val t0 = System.nanoTime()
      try {
        t.append(samples, incrementalRollup = true)
        val w = (System.nanoTime() - t0) / 1e9
        println(f"== $tag total ${w}%6.3f s ==")
        w
      } finally graft.core.Fs.rmTree(dir.toFile)
    }
    println("--- warmup ---")
    ingestOnce("warmup")
    Thread.sleep(500)
    println("--- run 1 ---")
    ingestOnce("run1")
    Thread.sleep(500)
    println("--- run 2 ---")
    ingestOnce("run2")
    spark.stop()
  }
}
