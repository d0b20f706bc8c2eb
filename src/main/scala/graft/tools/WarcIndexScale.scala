package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale receipt for the `.warc.gz` record-offset sidecar (SCALE.md):
  * the few-huge-segments delivery that file-granular parallelism
  * cannot spread — r10's WARC receipt showed 4 segments at 100× data
  * costing 14.4× wall where 16 segments cost 2.9×. The sidecar exists
  * to close exactly that row WITHOUT re-sharding the corpus.
  *
  * Stages `nFiles` large `.warc.gz` segments (`recsPerFile` records
  * each, HTML-wrapper bodies), then times three reads of the SAME
  * data:
  *
  *  - `stream` — [[graft.ingest.WarcSource.read]]: one task per file
  *    (the delivery-limited baseline).
  *  - `index_build` — [[graft.ingest.WarcGzIndex.buildAll]]: the
  *    one-time sequential pass per segment (also file-granular — this
  *    is the cost you pay once to unlock record-level splits).
  *  - `indexed` — [[graft.ingest.WarcGzIndex.readIndexed]] at
  *    `splitsPerFile` ranges per segment: the record-granular read.
  *
  * Each timed body forces a full parse (count of non-null payload
  * bytes), runs twice, keeps per-run arrays (freeze-prone VM), prints
  * one JSON line last.
  *
  * Usage: runMain graft.tools.WarcIndexScale <nFiles> <recsPerFile> [splitsPerFile]
  */
object WarcIndexScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: WarcIndexScale <nFiles> <recsPerFile> [splitsPerFile]")
    val nFiles = args(0).toInt
    val recs = args(1).toInt
    val splits = if (args.length > 2) args(2).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.SparkTuning.freezeTolerant(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ingest.{WarcGzIndex, WarcSource}

    val dir = java.nio.file.Files.createTempDirectory("graft_warcidx_scale")
    try {
      for (f <- 0 until nFiles) {
        val out = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(s"$dir/seg$f.warc.gz"), 1 << 16)
        for (r <- 0 until recs) {
          val id = f.toLong * recs + r
          val body = ("<html><body><p>doc " + id + " " +
            ("lorem ipsum dolor sit amet " * (1 + (id % 20).toInt)) +
            "</p></body></html>").getBytes("UTF-8")
          WarcSource.writeGzMember(out) { gz =>
            WarcSource.writeRecord(gz, "response",
              Seq("WARC-Target-URI" -> s"https://corpus.example/doc/$id",
                "Content-Type" -> "application/http; msgtype=response"),
              WarcSource.httpResponseBlock(200, "text/html", body))
          }
        }
        out.close()
      }
      val glob = s"$dir/*.warc.gz"

      def time[A](body: => A): (Double, A) = {
        val t0 = System.nanoTime()
        val a = body
        ((System.nanoTime() - t0) / 1e9, a)
      }
      def runs2[A](body: => A): (Seq[Double], A) = {
        val (t1, a) = time(body)
        val (t2, _) = time(body)
        (Seq(t1, t2), a)
      }

      val total = nFiles.toLong * recs
      def force(df: org.apache.spark.sql.DataFrame): Long = {
        import org.apache.spark.sql.functions._
        val n = df.agg(sum(length(col("payload")))).collect()(0).getLong(0)
        require(n > 0, "parse produced no payload bytes")
        df.count()
      }

      val (tStream, nStream) = runs2(force(WarcSource.read(spark, glob)))
      require(nStream == total, s"stream read $nStream != $total")
      val (tBuild, _) = time(WarcGzIndex.buildAll(spark, glob))
      val (tIndexed, nIdx) = runs2 {
        // one job over every file's ranges — the real usage shape
        force((0 until nFiles).map { f =>
          WarcGzIndex.readIndexed(spark, s"$dir/seg$f.warc.gz", splits)
        }.reduce(_ union _))
      }
      require(nIdx == total, s"indexed read $nIdx != $total")

      println(s"""{"tool":"WarcIndexScale","n_files":$nFiles,"recs_per_file":$recs,""" +
        s""""splits_per_file":$splits,"records":$total,""" +
        s""""stream_sec":[${tStream.map(t => f"$t%.3f").mkString(",")}],""" +
        s""""index_build_sec":${f"$tBuild%.3f"},""" +
        s""""indexed_sec":[${tIndexed.map(t => f"$t%.3f").mkString(",")}],""" +
        s""""speedup_min":${f"${tStream.min / tIndexed.min}%.2f"}}""")
    } finally {
      graft.core.Fs.rmTree(dir.toFile)
      spark.stop()
    }
  }
}
