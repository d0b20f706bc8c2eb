package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.storage.{TsdbConfig, TsdbTable}
import graft.streaming.ChangesStream

/** `format("graft-cdc")` as a real Structured Streaming source (r11):
  * a genuine StreamingQuery drives a [[ChangesStream.RollupReplica]]
  * through `foreachBatch`, with the engine's checkpoint carrying the
  * seq offsets — restart resumes, replays converge, rate limiting
  * bounds window width. */
class CdcSourceSpec extends SparkSuite {
  import java.nio.file.Files

  private val Base = 1704067200000L
  private val Day = 86400000L

  private def samples(rows: (String, String, Long, Double)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("name", "host", "time", "value")
      .select(col("name"), map(lit("host"), col("host")).as("labels"),
        col("time"), col("value"))
  }

  private def recompute(t: TsdbTable): Map[(String, String, Long), (Long, Double)] =
    t.readRaw(0L, Long.MaxValue)
      .groupBy(col("name"), col("labels_str"),
        (floor(col("time") / Day) * Day).cast("long").as("t"))
      .agg(count(lit(1)).as("count"), sum("value").as("sum"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap

  private def replicaMap(r: ChangesStream.RollupReplica): Map[(String, String, Long), (Long, Double)] =
    r.state().collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)) ->
        ((x.getLong(3), x.getDouble(4)))).toMap

  /** Drain everything currently committed through ONE AvailableNow
    * query against the shared checkpoint; returns per-batch row counts
    * of non-empty batches. */
  private def drainOnce(tableDir: String, ckpt: String,
                        apply: (DataFrame, Long) => Unit,
                        maxCommits: Option[Long] = None): Seq[Long] = {
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    var reader = spark.readStream.format("graft-cdc").option("path", tableDir)
    maxCommits.foreach(m => reader = reader.option("maxCommitsPerBatch", m.toString))
    val q = reader.load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, id: Long) =>
        val n = df.count()
        if (n > 0) counts.add(n)
        apply(df, id)
        ()
      }
      .start()
    q.awaitTermination(120000L)
    assert(!q.isActive, "AvailableNow query must terminate")
    q.stop()
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq
  }

  test("a real StreamingQuery drives the rollup replica: restart resumes from checkpoint, replica == recompute") {
    val dir = Files.createTempDirectory("cdc_src").toString
    val tableDir = s"$dir/table"
    val cfg = TsdbConfig(rollupIntervalMs = 3600000L, overrideOld = true)
    graft.core.SchemaJson.write(tableDir, cfg) // self-describing table: the
    // source reads MOR-ness from the persisted schema, never a guess
    val t = new TsdbTable(spark, tableDir, cfg)
    val replica = new ChangesStream.RollupReplica(spark, s"$dir/replica", Day)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def fold(df: DataFrame, batchId: Long): Unit = {
      df.select("_change_type").collect().foreach(r => seen.add(r.getString(0)))
      replica.applyBatch(df, batchId + 1) // engine batch ids are the tip unit
    }

    // window 1: initial corpus arrives as inserts
    t.append(samples(
      ("cpu", "a", Base + 1000, 1.0), ("cpu", "a", Base + 2000, 2.5),
      ("cpu", "a", Base + Day + 500, 4.0),
      ("mem", "b", Base + 3000, 10.0), ("mem", "b", Base + Day + 7, 20.0)))
    val c1 = drainOnce(tableDir, s"$dir/ckpt", fold)
    assert(c1.nonEmpty && c1.sum == 5, s"five insert rows, got $c1")
    assert(replicaMap(replica) == recompute(t).map(identity))
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet == Set("insert"))

    // nothing new: a fresh query on the same checkpoint produces no rows
    assert(drainOnce(tableDir, s"$dir/ckpt", fold).isEmpty,
      "no new commits -> no non-empty batch")

    // window 2 arrives while no query is running; a RESTARTED query
    // picks up exactly the new window: update (+preimage), delete, insert
    seen.clear()
    t.append(samples(("cpu", "a", Base + 1000, 100.0))) // MOR rewrite
    t.append(samples(("disk", "c", Base + 2 * Day + 1, 7.75)))
    t.delete(Base + Day, Base + 2 * Day - 1, metrics = Seq("cpu"))
    val c2 = drainOnce(tableDir, s"$dir/ckpt", fold)
    assert(c2.nonEmpty, "restart must serve the new window")
    assert(seen.asScala.toSet ==
      Set("insert", "update", "update_preimage", "delete"),
      s"all four change types through the stream: ${seen.asScala.toSet}")
    val expect = recompute(t)
    assert(replicaMap(replica) == expect,
      "replica maintained purely from streamed changes == recompute")

    // exactly-once under sink replay: re-applying the last batch's fold
    // with the same tip is a no-op (the DeltaView tip absorbs replays
    // the engine's at-least-once foreachBatch contract allows)
    val lastTip = replica.appliedUntil
    replica.applyBatch(
      t.changes(0, t.currentSeq(), preImages = true), lastTip)
    assert(replicaMap(replica) == expect, "replayed fold must be absorbed")
    graft.core.Fs.rmTree(new java.io.File(dir))
  }

  test("maxCommitsPerBatch bounds each batch to one commit window; offsets never regress across restarts") {
    val dir = Files.createTempDirectory("cdc_src_rate").toString
    val tableDir = s"$dir/table"
    val cfg = TsdbConfig(rollupIntervalMs = 3600000L, overrideOld = true)
    graft.core.SchemaJson.write(tableDir, cfg)
    val t = new TsdbTable(spark, tableDir, cfg)
    for (i <- 0 until 3)
      t.append(samples(("cpu", "a", Base + i * 1000, i.toDouble)))
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    def collect(df: DataFrame, id: Long): Unit =
      df.select("name", "time").collect()
        .foreach(r => rows.add((r.getString(0), r.getLong(1))))
    import scala.jdk.CollectionConverters._
    // AvailableNow latches ONE getOffset per run (the V1 wrapper), so a
    // rate-limited drain advances one commit boundary per run — loop
    // runs until all three rows arrive; the BOUND claim is that no
    // single batch ever carries more than one commit's rows
    def drainAll(expectRows: Int): Seq[Long] = {
      val all = scala.collection.mutable.ArrayBuffer[Long]()
      var runs = 0
      while (rows.size() < expectRows && runs < 20) {
        all ++= drainOnce(tableDir, s"$dir/ckpt", collect, maxCommits = Some(1L))
        runs += 1
      }
      assert(runs >= 3 || expectRows < 3,
        s"one boundary per run: three commits need >= 3 runs, took $runs")
      all.toSeq
    }
    val counts = drainAll(3)
    assert(counts.forall(_ == 1L),
      s"a rate-limited batch must never span two commits' rows: $counts")
    assert(rows.asScala.toSet ==
      (0 until 3).map(i => ("cpu", Base + i * 1000L)).toSet)
    // restart with MORE data: resumes above the checkpoint, no replay
    rows.clear()
    for (i <- 3 until 5)
      t.append(samples(("cpu", "a", Base + i * 1000, i.toDouble)))
    val counts2 = {
      val all = scala.collection.mutable.ArrayBuffer[Long]()
      var runs = 0
      while (rows.size() < 2 && runs < 20) {
        all ++= drainOnce(tableDir, s"$dir/ckpt", collect, maxCommits = Some(1L))
        runs += 1
      }
      all.toSeq
    }
    assert(counts2.forall(_ == 1L) && rows.asScala.toSet ==
      (3 until 5).map(i => ("cpu", Base + i * 1000L)).toSet,
      s"restart must serve exactly the two new commits: $counts2 ${rows.asScala}")
    // r12 (ADVICE r11): the durable offered-watermark must land inside
    // the REAL checkpoint — the engine hands metadataPath to the source
    // as a URI string (file:/...), and the old java.nio resolution wrote
    // a literal './file:...' directory under the CWD instead (lost on
    // any restart with a different CWD; driver-local on hdfs/s3a).
    assert(new java.io.File(s"$dir/ckpt/sources/0/graft-cdc-offered").isFile,
      "offered watermark must live under the checkpoint's sources/0 dir")
    assert(!new java.io.File("file:").exists,
      "no CWD-relative 'file:' junk tree may be created by the source")
    graft.core.Fs.rmTree(new java.io.File(dir))
  }

  test("source contract: schema is RawSchema + _change_type; missing path option fails fast") {
    assert(spark.readStream.format("graft-cdc")
      .option("path", "/nonexistent").load().schema ==
      graft.streaming.CdcSource.ChangeSchema)
    val e = intercept[Exception] {
      spark.readStream.format("graft-cdc").load()
    }
    assert(e.getMessage.toLowerCase.contains("path"))
  }
}
