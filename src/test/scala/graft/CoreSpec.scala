package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Labels, TimeUtil}
import graft.query.{Aggregates, SelectParams}

/** Pure-logic units (mirrors reference layer-1 tests: `timeutils_test.go`,
  * `labels` tests, `aggregate_test.go` planning parts). */
class TimeUtilSpec extends AnyFunSuite {
  test("durations: s/m/h/d and bare-number-is-hours (timeutils.go:42)") {
    assert(TimeUtil.parseDuration("90s") == 90000L)
    assert(TimeUtil.parseDuration("5m") == 300000L)
    assert(TimeUtil.parseDuration("2h") == 7200000L)
    assert(TimeUtil.parseDuration("1d") == 86400000L)
    assert(TimeUtil.parseDuration("3") == 3 * 3600000L)
    intercept[IllegalArgumentException](TimeUtil.parseDuration("10x"))
    intercept[IllegalArgumentException](TimeUtil.parseDuration("-5m"))
  }

  test("times: now/now±d/unix-ms/RFC3339 (timeutils.go:80-112)") {
    val now = 1700000000000L
    assert(TimeUtil.parseTime("now", now) == now)
    assert(TimeUtil.parseTime("now-2h", now) == now - 7200000L)
    assert(TimeUtil.parseTime("now+30m", now) == now + 1800000L)
    assert(TimeUtil.parseTime("1704067200000", now) == 1704067200000L)
    assert(TimeUtil.parseTime("2024-01-01T00:00:00Z", now) == 1704067200000L)
  }

  test("valid sample times: 1970..2400 (appender.go:42-43)") {
    assert(TimeUtil.isValidTime(0L))
    assert(TimeUtil.isValidTime(1704067200000L))
    assert(!TimeUtil.isValidTime(-1L))
    assert(!TimeUtil.isValidTime(TimeUtil.MaxTimeMs + 1))
  }
}

class LabelsSpec extends AnyFunSuite {
  test("canonical serialization sorts keys (labels.go:73-95)") {
    assert(Labels.canonicalStr(Map("z" -> "1", "a" -> "2")) == "a=2,z=1")
    assert(Labels.canonicalStr(Map.empty) == "")
  }

  test("metric name validation (validators.go)") {
    assert(Labels.isValidMetricName("cpu_usage:total"))
    assert(Labels.isValidMetricName("_internal"))
    assert(!Labels.isValidMetricName("1cpu"))
    assert(!Labels.isValidMetricName(""))
    assert(!Labels.isValidMetricName("cpu usage"))
  }
}

class AggregatesSpec extends AnyFunSuite {
  test("virtual-aggregate dependencies (select.go:447-481)") {
    assert(Aggregates.dependencies("avg") == Seq("count", "sum"))
    assert(Aggregates.dependencies("stddev") == Seq("count", "sum", "sqr"))
    assert(Aggregates.dependencies("rate") == Seq("last"))
    intercept[IllegalArgumentException](Aggregates.dependencies("median"))
  }

  test("requiredPartials always includes count (aggregate.go:151-173)") {
    assert(Aggregates.requiredPartials(Seq("max")) == Seq("count", "max"))
    assert(Aggregates.requiredPartials(Seq("avg")).toSet == Set("count", "sum"))
    assert(Aggregates.requiredPartials(Seq("stdvar", "last")).toSet ==
      Set("count", "sum", "sqr", "last"))
  }
}

class SelectParamsSpec extends AnyFunSuite {
  test("cross-series detection and _all/plain mixing rejection (select.go:427-443)") {
    assert(SelectParams(functions = "sum_all,count_all").isCrossSeries)
    assert(!SelectParams(functions = "sum,count").isCrossSeries)
    intercept[IllegalArgumentException](
      SelectParams(functions = "sum_all,count").isCrossSeries)
  }

  test("step=0 with functions spans the whole range (select.go:82-84)") {
    val p = SelectParams(functions = "sum", from = 100L, to = 600L)
    assert(p.effectiveStep == 500L)
    assert(SelectParams(from = 1, to = 2).effectiveStep == 0L)
  }
}

class SchemaDerivationSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.core.SchemaDerivation._

  test("rateToHours mirrors schema_test.go TestRateToHour") {
    assert(rateToHours("1/s") == 3600)
    assert(rateToHours("12/m") == 12 * 60)
    assert(rateToHours("2/h") == 2)
    Seq("1m", "1/t", "-431/t", "-1", "").foreach { bad =>
      intercept[IllegalArgumentException](rateToHours(bad))
    }
  }

  test("interval derivation matches the reference arithmetic (schema.go:136-164)") {
    // 1/s = 3600 samples/h: chunk = 4096/3600 = 1h; chunk capacity
    // 28800 B; 48 chunks (2 whole days) fit under 1.7 MB, 72 do not
    assert(deriveIntervalsHours(3600) == ((1, 48)))
    assert(derivePartitionIntervalMs("1/s") == 48L * 3600000L)
    // very high rate: chunk interval collapses to zero hours
    intercept[IllegalArgumentException](deriveIntervalsHours(5000))
    // Int-overflow rates must error, not wrap to a small accepted value
    intercept[IllegalArgumentException](rateToHours("1193047/s"))
  }
}

/** Driver testdata snapshots have flipped events.ts between
  * TIMESTAMP(NANOS) and TIMESTAMP(MICROS); pin that [[graft.core.Samples]]
  * normalizes BOTH layouts to identical epoch-ms (committed fixtures carry
  * the same three logical instants in each precision). */
class SamplesTimestampSpec extends SparkSuite {
  private def fromFixture(name: String): Seq[(String, Long, Double)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts").toString
    val src = getClass.getResourceAsStream(s"/$name.parquet")
    try java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$dir/events.parquet"))
    finally src.close()
    graft.core.Samples.fromEvents(spark, dir)
      .select("name", "time", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._2).toSeq
  }

  test("fromEvents: nanos-long and micros-timestamp layouts agree on epoch ms") {
    val nanos = fromFixture("events_nanos")
    val micros = fromFixture("events_micros")
    assert(nanos == micros)
    // absolute values: sub-ms precision floors — the reference's native
    // ms unit
    assert(micros.map(_._2) == Seq(1704067201500L, 1704070800123L, 1706659199999L))
  }
}

/** Driver-contract wiring: every benched name must be a real entry, and
  * every entry needs either a DuckDB twin or a documented no-oracle
  * declaration — a typo in one of these lists silently drops a query
  * from the round artifacts instead of failing. */
class ContractWiringSpec extends AnyFunSuite {
  test("Bench.Headline names are all SparkEntry.queries keys") {
    val unknown = Bench.Headline.toSet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"headline names with no entry: $unknown")
    assert(Bench.Headline.distinct.size == Bench.Headline.size,
      "duplicate headline names")
  }
  test("every oracleSql key is a queries key") {
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracle SQL with no entry: $orphaned")
  }
  test("every entry has a DuckDB twin or a declared rows-only exemption") {
    // the closed list of entries that are rows-only BY DESIGN — each has a
    // hash-exact proxy twin (see SURVEY §8); anything else without an
    // oracle is a forgotten twin, which the driver would silently record
    // as a weaker rows-only check
    val rowsOnly = Set("dedup_simhash", "multimodal_audio",
      "multimodal_features", "sim_ann_ivf", "sim_ann_ivfpq", "text_tokens_bpe")
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val missing = noOracle -- rowsOnly
    assert(missing.isEmpty, s"entries with no oracle and no exemption: $missing")
    val stale = rowsOnly -- noOracle
    assert(stale.isEmpty, s"exemptions that are no longer oracle-less: $stale")
  }
}

/** r16 guard (VERDICT item 8): the explicit repartition counts placed
  * ahead of the non-codegen window operators (QueryEngine.resample,
  * Sessions.byGap, Corpus.streamingCurate) must never fall below the
  * session's configured shuffle partitions — the production-sizing floor
  * claimed at those call sites. A refactor that drops the
  * `max(defaultParallelism, shuffle.partitions)` would silently turn the
  * local-parallelism fix into a scale regression; this pins it. */
class WindowPartitionsSpec extends SparkSuite {
  test("windowPartitions floors at shuffle.partitions AND defaultParallelism") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", 97)
    assert(graft.core.SparkTuning.windowPartitions(s2) >= 97)
    assert(graft.core.SparkTuning.windowPartitions(s2) >=
      s2.sparkContext.defaultParallelism)
    s2.conf.set("spark.sql.shuffle.partitions", 1)
    assert(graft.core.SparkTuning.windowPartitions(s2) ==
      s2.sparkContext.defaultParallelism)
  }
  test("the batch session-window shuffle carries the floored explicit count") {
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", 9)
    val df = s2.range(100).select((col("id") % 4).as("k"),
      (col("id") * 1000).as("t"), lit(1.0).as("v"))
    val out = graft.ops.Sessions.byGap(df, col("k"), col("t"), col("v"), 5000)
    val counts = out.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
          if r.optNumPartitions.isDefined => r.optNumPartitions.get
    }
    assert(counts.nonEmpty, "expected an explicit user-specified repartition in the plan")
    assert(counts.forall(_ >= 9), s"explicit counts below the configured floor: $counts")
  }
}
