package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `time_bucket(width, ts)` — fixed-width event-time bucketing (reference
  * `src/core_functions/scalar/date/time_bucket.cpp`): sub-month widths
  * bucket µs-arithmetic from origin 2000-01-03 00:00:00 UTC (a Monday, so
  * weekly buckets align to ISO weeks); month/year widths bucket by calendar
  * month from origin 2000-01-01.
  *
  * Composed from built-in codegen'd functions (no UDF): stays inside
  * whole-stage codegen and is partition-local — the natural pre-shuffle
  * bucketing key for streaming/windowed aggregation at any scale.
  */
object TimeFunctions {

  /** Epoch µs of 2000-01-03 00:00:00 UTC. */
  private val SubMonthOriginUs: Long = 946857600000000L

  private val UnitUs: Map[String, Long] = Map(
    "microsecond" -> 1L,
    "millisecond" -> 1000L,
    "second" -> 1000000L,
    "minute" -> 60L * 1000000L,
    "hour" -> 3600L * 1000000L,
    "day" -> 86400L * 1000000L,
    "week" -> 7L * 86400L * 1000000L)

  /** Parse "N unit(s)", e.g. "15 minutes", "1 month", "6 hours". */
  private def parse(width: String): (Long, String) = {
    val parts = width.trim.toLowerCase.split("\\s+")
    require(parts.length == 2, s"time_bucket width must be 'N unit': $width")
    val n = parts(0).toLong
    val unit = parts(1).stripSuffix("s")
    require(n > 0, s"time_bucket width must be positive: $width")
    (n, unit)
  }

  def timeBucket(width: String, ts: Column): Column = {
    val (n, unit) = parse(width)
    unit match {
      case "month" => monthBucket(n, ts)
      case "year" => monthBucket(n * 12, ts)
      case u =>
        val w = UnitUs.getOrElse(u,
          throw new IllegalArgumentException(s"unknown time_bucket unit: $u")) * n
        microBucket(w, ts)
    }
  }

  /** Floor-divide µs-since-origin by the width (floorMod keeps pre-origin
    * timestamps correct). */
  private def microBucket(widthUs: Long, ts: Column): Column = {
    val us = unix_micros(ts) - lit(SubMonthOriginUs)
    val offset = ((us % widthUs) + widthUs) % widthUs
    timestamp_micros(us - offset + lit(SubMonthOriginUs))
  }

  /** Calendar-month bucketing from 2000-01-01. */
  private def monthBucket(months: Long, ts: Column): Column = {
    val since = (year(ts) - lit(2000)) * lit(12) + (month(ts) - lit(1))
    val bucket = floor(since.cast("double") / lit(months.toDouble)).cast("int") * lit(months.toInt)
    add_months(to_date(lit("2000-01-01")), bucket).cast("timestamp")
  }
}
