package graft.core

/** Time/duration parsing with the reference's semantics.
  *
  * Mirrors v3io-tsdb `pkg/utils/timeutils.go`:
  *  - `Str2duration` (timeutils.go:40-74): `"[0-9]+[smhd]"` → millis; a bare
  *    number means HOURS (timeutils.go:42).
  *  - `Str2unixTime` (timeutils.go:80-112): `now`, `now±<dur>`, unix-ms
  *    digit strings, RFC3339 / RFC3339Nano.
  */
object TimeUtil {
  val MillisInSecond = 1000L
  val MillisInMinute = 60L * MillisInSecond
  val MillisInHour   = 60L * MillisInMinute
  val MillisInDay    = 24L * MillisInHour

  private val DurationRe = "^([0-9]+)([smhd]?)$".r

  /** `"90s"`→90000, `"5m"`, `"2h"`, `"1d"`, bare `"3"`→3 hours. */
  def parseDuration(s: String): Long = s.trim match {
    case DurationRe(n, unit) =>
      val v = n.toLong
      unit match {
        case "s" => v * MillisInSecond
        case "m" => v * MillisInMinute
        case "h" => v * MillisInHour
        case "d" => v * MillisInDay
        case ""  => v * MillisInHour // bare number = hours (timeutils.go:42)
      }
    case other =>
      throw new IllegalArgumentException(
        s"invalid duration '$other' — expected [0-9]+[smhd]")
  }

  /** `now`, `now-2h`, `now+30m`, unix-ms digits, or ISO-8601 → unix ms. */
  def parseTime(s: String, now: Long = System.currentTimeMillis()): Long = {
    val t = s.trim
    if (t.isEmpty) 0L
    else if (t == "now") now
    else if (t.startsWith("now-")) now - parseDuration(t.substring(4))
    else if (t.startsWith("now+")) now + parseDuration(t.substring(4))
    else if (t.forall(_.isDigit)) t.toLong
    else java.time.Instant.parse(t).toEpochMilli
  }

  /** Valid sample timestamps: years 1970..2400 in ms
    * (reference `pkg/appender/appender.go:42-43`). */
  val MinTimeMs = 0L
  val MaxTimeMs = 13569465600000L

  def isValidTime(t: Long): Boolean = t >= MinTimeMs && t <= MaxTimeMs
}
