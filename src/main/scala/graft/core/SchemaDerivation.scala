package graft.core

/** Schema sizing from the declared ingestion rate (reference F4:
  * `rateToHours` + `calculatePartitionAndChunkInterval`,
  * `pkg/tsdb/schema/schema.go:136-196`, size constants
  * `pkg/config/config.go:47-50`).
  *
  * The reference derives BOTH a chunk interval (per-series compressed blob)
  * and a partition interval (KV object ≤ 1.7 MB) from the rate. On Spark,
  * chunks are HOW — parquet row groups replace them — but the derived
  * partition interval is still the right default for `part_start`
  * time-partitioning: it bounds the per-series volume a partition holds
  * using the same arithmetic, so a table declared at "1/s" gets the same
  * 2-day partitions the reference would create.
  */
object SchemaDerivation {

  // reference config.go:47-50
  val MinChunkSizeBytes = 200
  val MaxChunkSizeBytes = 32 * 1024
  val MaxSampleSizeBytes = 8
  val MaxPartitionSizeBytes = 1700000

  /** `"N/[smh]"` → samples per hour (reference `rateToHours`,
    * `schema.go:166-196`; bare examples: "1/s" → 3600, "12/m" → 720). */
  def rateToHours(rate: String): Int = {
    val err = s"invalid samples ingestion rate '$rate' (expected \"[0-9]+/[smh]\", e.g. \"12/m\")"
    require(rate.length >= 3 && rate(rate.length - 2) == '/', err)
    val n = rate.dropRight(2).toIntOption.getOrElse(throw new IllegalArgumentException(err))
    require(n > 0, s"invalid samples ingestion rate '$rate': sample count must be positive")
    // Long math: Int n*3600 can wrap to a small positive value and derive
    // a bogus-but-accepted partition interval instead of erroring
    val perHour: Long = rate.last match {
      case 's' => n.toLong * 3600
      case 'm' => n.toLong * 60
      case 'h' => n.toLong
      case _ => throw new IllegalArgumentException(err)
    }
    require(perHour <= Int.MaxValue, s"the samples ingestion rate ($rate) is too high")
    perHour.toInt
  }

  /** `(chunkIntervalHours, partitionIntervalHours)` — the reference's
    * `calculatePartitionAndChunkInterval` (`schema.go:136-164`) verbatim:
    * chunk holds ≤ 32 KB of 8 B samples at the rate; partition packs
    * whole days of chunks under the 1.7 MB object cap. */
  def deriveIntervalsHours(rateInHours: Int): (Int, Int) = {
    val maxEventsPerChunk = MaxChunkSizeBytes / MaxSampleSizeBytes
    val minEventsPerChunk = MinChunkSizeBytes / MaxSampleSizeBytes
    val chunkInterval = maxEventsPerChunk / rateInHours
    require(chunkInterval > 0, s"the samples ingestion rate ($rateInHours/h) is too high")
    require(chunkInterval >= minEventsPerChunk / rateInHours,
      s"the calculated chunk size is smaller than the minimum ($MinChunkSizeBytes B) " +
        s"at rate $rateInHours/h")
    val actualChunkCapacity = chunkInterval * rateInHours * MaxSampleSizeBytes
    var chunksInPartition = 0
    while ((chunksInPartition + 24) * actualChunkCapacity < MaxPartitionSizeBytes)
      chunksInPartition += 24
    require(chunksInPartition > 0,
      s"the samples ingestion rate ($rateInHours/h) is too high — cannot fit a partition " +
        s"in a day interval with the calculated chunk interval (${chunkInterval}h)")
    (chunkInterval, chunksInPartition * chunkInterval)
  }

  /** Partition interval in ms for a rate string — the piece Spark uses. */
  def derivePartitionIntervalMs(rate: String): Long =
    deriveIntervalsHours(rateToHours(rate))._2.toLong * 3600000L
}
