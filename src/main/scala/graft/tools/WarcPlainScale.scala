package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale receipt for sidecar-free PLAIN `.warc` record-level splits
  * (SCALE.md, r12): same few-huge-segments shape as [[WarcIndexScale]],
  * uncompressed segments. Times two reads of the same data:
  *
  *  - `stream` — [[graft.ingest.WarcSource.read]]: one task per file.
  *  - `split` — [[graft.ingest.WarcPlainSplit.readSplit]] at
  *    `splitsPerFile` ranges per segment: header-hop scan (phase 1,
  *    seeks past payloads) + exact-count parallel parse (phase 2).
  *    The split timing INCLUDES the scan — there is no amortizable
  *    sidecar; the prepass is paid per read and must still win.
  *
  * Usage: runMain graft.tools.WarcPlainScale <nFiles> <recsPerFile> [splitsPerFile]
  */
object WarcPlainScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: WarcPlainScale <nFiles> <recsPerFile> [splitsPerFile]")
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
    import graft.ingest.{WarcPlainSplit, WarcSource}

    val dir = java.nio.file.Files.createTempDirectory("graft_warcplain_scale")
    try {
      for (f <- 0 until nFiles) {
        val out = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(s"$dir/seg$f.warc"), 1 << 16)
        for (r <- 0 until recs) {
          val id = f.toLong * recs + r
          val body = ("<html><body><p>doc " + id + " " +
            ("lorem ipsum dolor sit amet " * (1 + (id % 20).toInt)) +
            "</p></body></html>").getBytes("UTF-8")
          WarcSource.writeRecord(out, "response",
            Seq("WARC-Target-URI" -> s"https://corpus.example/doc/$id",
              "Content-Type" -> "application/http; msgtype=response"),
            WarcSource.httpResponseBlock(200, "text/html", body))
        }
        out.close()
      }

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

      val (tStream, nStream) = runs2(force(WarcSource.read(spark, s"$dir/*.warc")))
      require(nStream == total, s"stream read $nStream != $total")
      val (tSplit, nSplit) = runs2 {
        force((0 until nFiles).map { f =>
          WarcPlainSplit.readSplit(spark, s"$dir/seg$f.warc", splits)
        }.reduce(_ union _))
      }
      require(nSplit == total, s"split read $nSplit != $total")

      println(s"""{"tool":"WarcPlainScale","n_files":$nFiles,"recs_per_file":$recs,""" +
        s""""splits_per_file":$splits,"records":$total,""" +
        s""""stream_sec":[${tStream.map(t => f"$t%.3f").mkString(",")}],""" +
        s""""split_sec":[${tSplit.map(t => f"$t%.3f").mkString(",")}],""" +
        s""""speedup_min":${f"${tStream.min / tSplit.min}%.2f"}}""")
    } finally {
      graft.core.Fs.rmTree(dir.toFile)
      spark.stop()
    }
  }
}
