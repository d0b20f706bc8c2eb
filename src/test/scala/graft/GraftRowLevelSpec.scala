package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.storage.{TsdbConfig, TsdbTable}

/** SQL UPDATE / MERGE INTO / predicated DELETE on `USING graft` tables
  * (r15): SupportsRowLevelOperations mapped onto the MOR LWW machinery.
  * Every mutation is checked against the equivalent write-API twin —
  * the SQL path must land byte-identical merged views. */
class GraftRowLevelSpec extends SparkSuite {

  private val Base = 1704067200000L // 2024-01-01
  private val Day = 86400000L

  private def samples(rows: (String, String, Long, Double)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("name", "host", "time", "value")
      .select(col("name"), map(lit("host"), col("host")).as("labels"),
        col("time"), col("value"))
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.select("name", "labels_str", "time", "value", "valueStr",
        "series_id", "part_start")
      .collect().map(_.toString).sorted.toSeq

  private def morTable(prefix: String,
                       rows: (String, String, Long, Double)*): (String, TsdbTable) = {
    val dir = Files.createTempDirectory(prefix).toString
    val t = new TsdbTable(spark, s"$dir/tbl", TsdbConfig(overrideOld = true))
    t.append(samples(rows: _*))
    (s"$dir/tbl", t)
  }

  test("SQL UPDATE: key-stable update is an LWW re-append") {
    val (path, t) = morTable("graft_rlo_upd",
      ("cpu", "a", Base, 1.0), ("cpu", "b", Base + 1000, 2.0),
      ("mem", "a", Base + Day, 3.0))
    spark.sql(s"CREATE TABLE graft_rlo_u USING graft OPTIONS (path '$path')")
    try {
      val physBefore = spark.read.parquet(s"$path/raw").count()
      spark.sql("UPDATE graft_rlo_u SET value = value * 10 WHERE name = 'cpu'")
      // additive: the update re-appends newer versions, never rewrites
      assert(spark.read.parquet(s"$path/raw").count() > physBefore)
      val out = spark.read.format("graft").load(path)
        .select("name", "time", "value").orderBy("time")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(out == Seq(("cpu", Base, 10.0), ("cpu", Base + 1000, 20.0),
        ("mem", Base + Day, 3.0)))
      // engine view agrees (same merged LWW semantics)
      assert(sortedRows(spark.read.format("graft").load(path)) ==
        sortedRows(t.readRaw(0L, Long.MaxValue)))
      // rollup rebuilt: served aggregate reflects the update
      val roll = spark.read.parquet(s"$path/rollup")
      assert(roll.agg(sum("__p_sum")).head().getDouble(0) == 33.0)
    } finally spark.sql("DROP TABLE graft_rlo_u")
  }

  test("SQL UPDATE moving the LWW key tombstones the old key") {
    val (path, t) = morTable("graft_rlo_mv",
      ("cpu", "a", Base, 1.0), ("cpu", "a", Base + 1000, 2.0))
    spark.sql(s"CREATE TABLE graft_rlo_m USING graft OPTIONS (path '$path')")
    try {
      spark.sql(s"UPDATE graft_rlo_m SET time = time + 500 WHERE time = $Base")
      val out = spark.read.format("graft").load(path)
        .select("time", "value").orderBy("time")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(out == Seq((Base + 500, 1.0), (Base + 1000, 2.0)),
        s"old key must be gone, got $out")
      assert(sortedRows(spark.read.format("graft").load(path)) ==
        sortedRows(t.readRaw(0L, Long.MaxValue)))
    } finally spark.sql("DROP TABLE graft_rlo_m")
  }

  test("MERGE INTO: update + delete + insert branches under one commit") {
    val (path, t) = morTable("graft_rlo_mrg",
      ("cpu", "a", Base, 1.0), ("cpu", "b", Base + 1000, 2.0),
      ("mem", "a", Base + 2000, 3.0))
    val seqBefore = t.currentSeq()
    spark.sql(s"CREATE TABLE graft_rlo_g USING graft OPTIONS (path '$path')")
    import spark.implicits._
    val src = Seq(
      ("cpu", "a", Base, 100.0, "update"),
      ("cpu", "b", Base + 1000, 0.0, "delete"),
      ("disk", "c", Base + 3000, 4.0, "insert"))
      .toDF("name", "host", "time", "value", "action")
      .select(col("name"), map(lit("host"), col("host")).as("labels"),
        col("time"), col("value"), col("action"))
    src.createOrReplaceTempView("graft_rlo_src")
    try {
      spark.sql(
        """MERGE INTO graft_rlo_g tgt USING graft_rlo_src src
          |ON tgt.name = src.name AND tgt.labels_str = concat('host=', src.labels['host'])
          |   AND tgt.time = src.time
          |WHEN MATCHED AND src.action = 'delete' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET value = src.value
          |WHEN NOT MATCHED THEN INSERT (name, labels, time, value)
          |  VALUES (src.name, src.labels, src.time, src.value)
          |""".stripMargin)
      val out = spark.read.format("graft").load(path)
        .select("name", "time", "value").orderBy("time")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(out == Seq(("cpu", Base, 100.0), ("mem", Base + 2000, 3.0),
        ("disk", Base + 3000, 4.0)))
      // ONE commit seq for the whole mutation (cross-partition atomicity)
      val t2 = new TsdbTable(spark, path, TsdbConfig(overrideOld = true))
      assert(t2.currentSeq() > seqBefore)
      assert(spark.read.parquet(s"$path/raw")
        .filter(col("__seq") > seqBefore).select("__seq").distinct().count() == 1,
        "all three branches must land under one seq")
      // names refreshed: disk in, and the merged view agrees with engine
      assert(t2.names().collect().map(_.getString(0)).sorted.toSeq ==
        Seq("cpu", "disk", "mem"))
      assert(sortedRows(spark.read.format("graft").load(path)) ==
        sortedRows(t2.readRaw(0L, Long.MaxValue)))
    } finally spark.sql("DROP TABLE graft_rlo_g")
  }

  test("DELETE with an untranslatable predicate rides the row-level path on MOR") {
    val (path, t) = morTable("graft_rlo_del",
      ("cpu", "a", Base, 1.0), ("cpu", "a", Base + 1000, 5.0),
      ("cpu", "b", Base + 2000, 2.0))
    spark.sql(s"CREATE TABLE graft_rlo_d USING graft OPTIONS (path '$path')")
    try {
      // value predicates can't translate to the metadata delete surface
      // (below-the-merge unstable) — pre-r15 this rejected loudly; now it
      // tombstones exactly the matching post-merge rows
      spark.sql("DELETE FROM graft_rlo_d WHERE value > 1.5")
      val out = spark.read.format("graft").load(path)
        .select("value").collect().map(_.getDouble(0)).toSeq
      assert(out == Seq(1.0))
      assert(sortedRows(spark.read.format("graft").load(path)) ==
        sortedRows(t.readRaw(0L, Long.MaxValue)))
    } finally spark.sql("DROP TABLE graft_rlo_d")
  }

  test("UPDATE composes with a narrow CTAS-declared schema") {
    val dir = Files.createTempDirectory("graft_rlo_ctas").toString
    samples(("cpu", "a", Base, 1.0), ("cpu", "b", Base + 1000, 2.0))
      .createOrReplaceTempView("graft_rlo_ctas_src")
    // CTAS stores the 4-col query schema; the table serves that
    // projection and row-level ops must still resolve the row ID
    // through the metadata columns
    spark.sql("CREATE TABLE graft_rlo_ctas_t USING graft " +
      s"OPTIONS (path '$dir/tbl', overrideOld 'true') " +
      "AS SELECT * FROM graft_rlo_ctas_src")
    try {
      spark.sql(s"UPDATE graft_rlo_ctas_t SET value = 7.0 WHERE time = $Base")
      val got = spark.sql("SELECT time, value FROM graft_rlo_ctas_t ORDER BY time")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == Seq((Base, 7.0), (Base + 1000, 2.0)))
      // the full raw view agrees through the path-based read
      val t = new TsdbTable(spark, s"$dir/tbl",
        TsdbConfig(overrideOld = true))
      assert(sortedRows(spark.read.format("graft").load(s"$dir/tbl")) ==
        sortedRows(t.readRaw(0L, Long.MaxValue)))
    } finally spark.sql("DROP TABLE IF EXISTS graft_rlo_ctas_t")
  }

  test("FUZZ row-level ops (r15): random UPDATE/MERGE/DELETE/append sequences match a model") {
    val rnd = new scala.util.Random(20250815L)
    val Hour = 3600000L
    (0 until 3).foreach { round =>
      val dir = Files.createTempDirectory(s"graft_rlo_fuzz$round").toString
      val t = new TsdbTable(spark, s"$dir/tbl", TsdbConfig(overrideOld = true))
      val names = Seq("cpu", "mem", "disk")
      val hosts = Seq("a", "b", "c", "d")
      // driver-side model: key -> value (unique keys by construction)
      val model = scala.collection.mutable.Map.empty[(String, String, Long), Double]
      val init = (0 until 80).map { k =>
        val key = (names(k % 3), hosts(k % 4), Base + (k / 2) * Hour)
        key -> (k + rnd.nextInt(5)).toDouble
      }.toMap // dedupe identical keys
      init.foreach { case (k, v) => model(k) = v }
      t.append(samples(init.map { case ((n, h, tt), v) => (n, h, tt, v) }.toSeq: _*))
      val tbl = s"graft_rlo_fz_${round}_${System.nanoTime()}"
      spark.sql(s"CREATE TABLE $tbl USING graft OPTIONS (path '$dir/tbl')")
      def check(step: String): Unit = {
        val got = spark.sql(
          s"SELECT name, labels_str, time, value FROM $tbl")
          .collect().map(r => ((r.getString(0),
            r.getString(1).stripPrefix("host="), r.getLong(2)),
            r.getDouble(3))).toMap
        assert(got == model.toMap,
          s"round $round after $step: table=${got.size} model=${model.size} " +
            s"diff=${(got.toSet diff model.toSet).take(3)} / " +
            s"${(model.toSet diff got.toSet).take(3)}")
      }
      try {
        (0 until 5).foreach { step =>
          rnd.nextInt(4) match {
            case 0 => // key-stable UPDATE on a (name, time-range) slice
              val n = names(rnd.nextInt(3))
              val lo = Base + rnd.nextInt(30) * Hour
              val hi = lo + rnd.nextInt(10) * Hour
              spark.sql(s"UPDATE $tbl SET value = value * 2 + 1 " +
                s"WHERE name = '$n' AND time BETWEEN $lo AND $hi")
              model.keys.toSeq.foreach { case k @ (kn, _, kt) =>
                if (kn == n && kt >= lo && kt <= hi) model(k) = model(k) * 2 + 1
              }
              check(s"$step:update")
            case 1 => // key-MOVING update: shift a slice; LWW overwrites targets
              val n = names(rnd.nextInt(3))
              val h = hosts(rnd.nextInt(4))
              val lo = Base + rnd.nextInt(30) * Hour
              val hi = lo + rnd.nextInt(6) * Hour
              val shift = (1 + rnd.nextInt(3)) * 7 * Hour
              spark.sql(s"UPDATE $tbl SET time = time + $shift " +
                s"WHERE name = '$n' AND labels_str = 'host=$h' " +
                s"AND time BETWEEN $lo AND $hi")
              val moved = model.keys.toSeq.collect {
                case k @ (kn, kh, kt) if kn == n && kh == h && kt >= lo && kt <= hi => k
              }
              val vals = moved.map(k => k -> model(k)).toMap
              moved.foreach(model.remove)
              vals.foreach { case ((kn, kh, kt), v) => model((kn, kh, kt + shift)) = v }
              check(s"$step:move")
            case 2 => // value-predicated DELETE (the row-level delete path)
              val n = names(rnd.nextInt(3))
              val cut = 20 + rnd.nextInt(60)
              spark.sql(s"DELETE FROM $tbl WHERE name = '$n' AND value > $cut")
              model.keys.toSeq.foreach { case k @ (kn, _, _) =>
                if (kn == n && model(k) > cut) model.remove(k)
              }
              check(s"$step:delete")
            case 3 => // MERGE: update/delete a sample of existing keys + insert new
              import spark.implicits._
              // sort first: map iteration order is JVM-dependent and the
              // seeded shuffle should reproduce across runs
              val existing = rnd.shuffle(
                model.keys.toSeq.sortBy(k => (k._1, k._2, k._3))).take(6)
              val (toDel, toUpd) = existing.splitAt(existing.length / 2)
              val fresh = (0 until 3).map(j =>
                (names(rnd.nextInt(3)), s"z$j",
                  Base + (200 + rnd.nextInt(50)) * Hour, rnd.nextInt(10).toDouble))
              val srcRows =
                toDel.map { case (n, h, tt) => (n, h, tt, 0.0, "delete") } ++
                toUpd.map { case (n, h, tt) => (n, h, tt, rnd.nextInt(100).toDouble, "update") } ++
                fresh.map { case (n, h, tt, v) => (n, h, tt, v, "insert") }
              val view = s"${tbl}_src$step"
              srcRows.toDF("name", "host", "time", "value", "action")
                .select(col("name"), map(lit("host"), col("host")).as("labels"),
                  col("time"), col("value"), col("action"))
                .createOrReplaceTempView(view)
              spark.sql(
                s"""MERGE INTO $tbl tgt USING $view src
                   |ON tgt.name = src.name
                   |   AND tgt.labels_str = concat('host=', src.labels['host'])
                   |   AND tgt.time = src.time
                   |WHEN MATCHED AND src.action = 'delete' THEN DELETE
                   |WHEN MATCHED THEN UPDATE SET value = src.value
                   |WHEN NOT MATCHED THEN INSERT (name, labels, time, value)
                   |  VALUES (src.name, src.labels, src.time, src.value)
                   |""".stripMargin)
              toDel.foreach(model.remove)
              srcRows.filter(_._5 == "update").foreach { case (n, h, tt, v, _) =>
                model((n, h, tt)) = v }
              srcRows.filter(_._5 == "insert").foreach { case (n, h, tt, v, _) =>
                model((n, h, tt)) = v } // unmatched by construction (fresh keys)
              spark.catalog.dropTempView(view)
              check(s"$step:merge")
          }
          // interleaved plain append (the sequential stand-in for a
          // racing writer): new keys land through INSERT INTO and the
          // next mutation's scan must see them
          if (rnd.nextBoolean()) {
            val n = names(rnd.nextInt(3))
            val tt = Base + (300 + rnd.nextInt(40) + step * 50) * Hour
            val v = rnd.nextInt(20).toDouble
            spark.sql(s"INSERT INTO $tbl (name, labels, time, value) " +
              s"VALUES ('$n', map('host', 'w'), $tt, $v)")
            model((n, "w", tt)) = v
            check(s"$step:append")
          }
        }
      } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("row-level ops reject on non-MOR tables; filter deletes still work there") {
    val dir = Files.createTempDirectory("graft_rlo_cow").toString
    val t = new TsdbTable(spark, s"$dir/tbl")
    t.append(samples(("cpu", "a", Base, 1.0), ("cpu", "a", Base + 1000, 2.0)))
    spark.sql(s"CREATE TABLE graft_rlo_c USING graft OPTIONS (path '$dir/tbl')")
    try {
      val e = intercept[Exception] {
        spark.sql("UPDATE graft_rlo_c SET value = 9.0 WHERE time = " + Base)
      }
      assert(e.getMessage.contains("merge-on-read") ||
        Option(e.getCause).exists(_.getMessage.contains("merge-on-read")),
        s"unexpected error: $e")
      // translatable DELETE keeps riding the metadata path untouched
      spark.sql(s"DELETE FROM graft_rlo_c WHERE time = ${Base + 1000}")
      assert(spark.read.format("graft").load(s"$dir/tbl").count() == 1)
    } finally spark.sql("DROP TABLE graft_rlo_c")
  }
}
