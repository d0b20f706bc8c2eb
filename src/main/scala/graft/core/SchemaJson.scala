package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.storage.TsdbConfig

/** Persisted table schema (reference `.schema` v4 JSON,
  * `pkg/config/config.go:209-244`; created from rate/granularity by
  * `schema.NewSchema`, `pkg/tsdb/schema/schema.go:39-134`).
  *
  * Minimal JSON round-trip without external deps: the config is flat. */
object SchemaJson {

  val FileName = ".schema"

  private def fsFor(tablePath: String, conf: Configuration) = {
    val p = new Path(tablePath, FileName)
    (p.getFileSystem(conf), p)
  }

  /** All IO goes through the Hadoop FileSystem (r12, review-caught): the
    * old java.nio paths silently read DEFAULTS for any table addressed
    * by URI (`file:`, `hdfs://`, `s3a://`) — on a cluster checkpoint the
    * declared MOR-ness/intervals would simply not be seen. Callers with
    * a SparkSession should pass its hadoopConfiguration. */
  def write(tablePath: String, c: TsdbConfig,
            conf: Configuration = new Configuration()): Unit = {
    c.validateForCreate() // creation-time-only rules (day-aligned granularity)
    val preAgg = c.preAggregates
      .map(_.map(l => s""""$l"""").mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    val json =
      s"""{
         |  "version": 5,
         |  "partitionIntervalMs": ${c.partitionIntervalMs},
         |  "rollupIntervalMs": ${c.rollupIntervalMs},
         |  "aggregates": ${c.aggregates.map(a => s""""$a"""").mkString("[", ",", "]")},
         |  "useServerAggregateCoefficient": ${c.useServerAggregateCoefficient},
         |  "lateArrivalMs": ${c.lateArrivalMs},
         |  "overrideOld": ${c.overrideOld},
         |  "preAggregates": $preAgg
         |}""".stripMargin
    val (fs, p) = fsFor(tablePath, conf)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Hot-reloading read (reference `ReadAndUpdateSchema`,
    * `pkg/partmgr/partmgr.go:228-264`): the parsed config is cached per
    * table and re-read ONLY when the `.schema` mtime changes, so a
    * long-lived session picks up config edits between queries without
    * re-parsing per call. A deleted schema file also drops the cache
    * entry (the table is gone, not frozen at its last config). */
  private val cache = scala.collection.concurrent.TrieMap
    .empty[String, ((Long, Long), TsdbConfig)]

  def readCached(tablePath: String,
                 conf: Configuration = new Configuration()): Option[TsdbConfig] = {
    val (fs, p) = fsFor(tablePath, conf)
    val st = try fs.getFileStatus(p)
    catch { case _: java.io.FileNotFoundException =>
      cache.remove(tablePath); return None }
    // (mtime, size): size catches rewrites inside one mtime tick on
    // coarse-granularity filesystems (same-length rewrites within one
    // tick still slip through, as in the reference's pure-mtime check)
    val stamp = (st.getModificationTime, st.getLen)
    cache.get(tablePath) match {
      case Some((s, c)) if s == stamp => Some(c)
      case _ => read(tablePath, conf).map { c => cache.put(tablePath, (stamp, c)); c }
    }
  }

  def read(tablePath: String,
           conf: Configuration = new Configuration()): Option[TsdbConfig] = {
    val (fs, p) = fsFor(tablePath, conf)
    val s = try {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    } catch { case _: java.io.FileNotFoundException => return None }
    def long(k: String, dflt: Long): Long =
      s"""\"$k\"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(dflt)
    def strList(src: String): Seq[String] =
      "\"([^\"]+)\"".r.findAllMatchIn(src).map(_.group(1)).toSeq
    val aggs = s"""\"aggregates\"\\s*:\\s*(\\[[^\\]]*\\])""".r
      .findFirstMatchIn(s).map(m => strList(m.group(1)))
    val preAgg = s"""\"preAggregates\"\\s*:\\s*(\\[.*?\\]\\])""".r
      .findFirstMatchIn(s)
      .map(m => "\\[([^\\[\\]]*)\\]".r.findAllMatchIn(m.group(1))
        .map(mm => strList(mm.group(1))).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val d = TsdbConfig()
    // v5 adds overrideOld (the table's MOR-ness is a TABLE property —
    // the CDC streaming source must not guess it); absent in v<=4 files
    // means the pre-MOR-aware default, false
    val mor = s"""\"overrideOld\"\\s*:\\s*(true|false)""".r
      .findFirstMatchIn(s).exists(_.group(1) == "true")
    Some(TsdbConfig(
      partitionIntervalMs = long("partitionIntervalMs", d.partitionIntervalMs),
      rollupIntervalMs = long("rollupIntervalMs", d.rollupIntervalMs),
      aggregates = aggs.getOrElse(d.aggregates),
      useServerAggregateCoefficient = long("useServerAggregateCoefficient",
        d.useServerAggregateCoefficient).toInt,
      lateArrivalMs = long("lateArrivalMs", d.lateArrivalMs),
      overrideOld = mor,
      preAggregates = preAgg))
  }
}
