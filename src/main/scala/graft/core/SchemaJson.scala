package graft.core

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.storage.TsdbConfig

/** Persisted table schema (reference `.schema` v4 JSON,
  * `pkg/config/config.go:209-244`; created from rate/granularity by
  * `schema.NewSchema`, `pkg/tsdb/schema/schema.go:39-134`).
  *
  * Minimal JSON round-trip without external deps: the config is flat. */
object SchemaJson {

  val FileName = ".schema"

  def write(tablePath: String, c: TsdbConfig): Unit = {
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
    Files.createDirectories(Paths.get(tablePath))
    Files.writeString(Paths.get(tablePath, FileName), json,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Hot-reloading read (reference `ReadAndUpdateSchema`,
    * `pkg/partmgr/partmgr.go:228-264`): the parsed config is cached per
    * table and re-read ONLY when the `.schema` mtime changes, so a
    * long-lived session picks up config edits between queries without
    * re-parsing per call. A deleted schema file also drops the cache
    * entry (the table is gone, not frozen at its last config). */
  private val cache = scala.collection.concurrent.TrieMap
    .empty[String, ((java.nio.file.attribute.FileTime, Long), TsdbConfig)]

  def readCached(tablePath: String): Option[TsdbConfig] = {
    val p = Paths.get(tablePath, FileName)
    if (!Files.exists(p)) { cache.remove(tablePath); return None }
    // (mtime, size): size catches rewrites inside one mtime tick on
    // coarse-granularity filesystems (same-length rewrites within one
    // tick still slip through, as in the reference's pure-mtime check)
    val stamp = (Files.getLastModifiedTime(p), Files.size(p))
    cache.get(tablePath) match {
      case Some((s, c)) if s == stamp => Some(c)
      case _ => read(tablePath).map { c => cache.put(tablePath, (stamp, c)); c }
    }
  }

  def read(tablePath: String): Option[TsdbConfig] = {
    val p = Paths.get(tablePath, FileName)
    if (!Files.exists(p)) return None
    val s = Files.readString(p)
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
