package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway hot-frame sampler for the columnar scan lanes: stages the
  * Dsv2Scale table, loops one lane, and samples executor stacks every
  * few ms, printing the top aggregated frames. Diagnostic only — not
  * part of the driver contract. Usage:
  *   runMain graft.tools.ColProfile <sfDir> <factor> <lane: narrow|map|wide|native>
  */
object ColProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args(1).toInt
    val lane = args(2)
    val mor = args.length > 3 && args(3).toBoolean
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.SparkTuning.freezeTolerant(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_colprof")
    try {
      val ev0 = graft.core.Samples.fromEvents(spark, sfDir).drop("valueStr")
      val samples =
        if (factor <= 1) ev0
        else ev0.crossJoin(spark.range(factor.toLong).toDF("k"))
          .withColumn("labels",
            map(lit("user"), concat(col("labels")("user"), lit("_"), col("k"))))
          .drop("k")
      val t = new graft.storage.TsdbTable(spark, s"$dir/table",
        graft.storage.TsdbConfig(overrideOld = mor))
      t.append(samples)
      if (mor) // the Dsv2Scale rewrite burst: real merge work
        t.append(samples.filter(col("name") === "click")
          .withColumn("value", col("value") + 1))

      def body(): Unit = lane match {
        // abs() keeps the narrow lanes on the COLUMNAR SCAN path — a
        // bare-column sum would ride the r14 aggregate pushdown instead
        case "narrow" =>
          spark.read.format("graft").load(s"$dir/table")
            .agg(count(lit(1)), sum(abs(col("value")))).collect()
        case "native" =>
          spark.read.parquet(s"$dir/table/raw")
            .agg(count(lit(1)), sum(abs(col("value")))).collect()
        case "sum" => // the pushed-aggregate page walk
          spark.read.format("graft").load(s"$dir/table")
            .agg(count(lit(1)), sum("value")).collect()
        case "map" =>
          spark.read.format("graft").load(s"$dir/table")
            .agg(count(lit(1)), sum(size(col("labels")))).collect()
        case "wide" =>
          spark.read.format("graft").load(s"$dir/table")
            .agg(count(lit(1)), sum("value"), sum(col("time") % 997),
              sum(length(col("name")))).collect()
      }
      body() // warm-up

      val counts = new ConcurrentHashMap[String, java.lang.Integer]()
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          Thread.getAllStackTraces.forEach { (th, frames) =>
            if (th.getName.contains("Executor task launch") && frames.nonEmpty) {
              // topmost interesting frame: skip pure waiting frames
              val top = frames.take(8).find { f =>
                val c = f.getClassName
                !c.startsWith("java.lang.Object") && !c.startsWith("jdk.internal") &&
                  !c.startsWith("java.util.concurrent") && !c.startsWith("sun.")
              }
              top.foreach { f =>
                val key = s"${f.getClassName}.${f.getMethodName}"
                counts.merge(key, 1, (a, b) => a + b)
              }
            }
          }
          Thread.sleep(2)
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      val t0 = System.nanoTime()
      var it = 0
      while (System.nanoTime() - t0 < 15e9 && it < 60) { body(); it += 1 }
      sampling = false
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"LANE $lane: $it iterations in $secs%.1f s (${secs / it}%.3f s/iter)")
      import scala.jdk.CollectionConverters._
      counts.asScala.toSeq.sortBy(-_._2).take(30).foreach { case (k, v) =>
        println(f"$v%6d  $k")
      }
    } finally {
      graft.core.Fs.rmTree(dir.toFile)
      spark.stop()
    }
  }
}
