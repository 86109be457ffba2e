package graft.functions

import graft.SparkSpec
import graft.functions.{GraftFunctions => G}
import org.apache.spark.sql.functions._

/** time_bucket semantics — expected values verified against the oracle
  * engine (origin 2000-01-03 for sub-month widths, 2000-01-01 for months). */
class TimeBucketSpec extends SparkSpec {
  import spark.implicits._

  private def bucket(width: String, ts: String): String =
    Seq(ts).toDF("t")
      .select(date_format(G.time_bucket(width, $"t".cast("timestamp")),
        "yyyy-MM-dd HH:mm:ss"))
      .head.getString(0)

  test("7-minute buckets align to 2000-01-03 origin") {
    assert(bucket("7 minutes", "2024-01-01 00:20:00") == "2024-01-01 00:14:00")
  }

  test("weekly buckets align to Monday") {
    assert(bucket("1 week", "2024-01-10 10:00:00") == "2024-01-08 00:00:00")
  }

  test("daily/hourly buckets truncate") {
    assert(bucket("1 day", "2024-01-06 10:00:00") == "2024-01-06 00:00:00")
    assert(bucket("6 hours", "2024-01-06 17:30:00") == "2024-01-06 12:00:00")
  }

  test("month buckets use calendar arithmetic from 2000-01-01") {
    assert(bucket("1 month", "2024-02-15 10:00:00") == "2024-02-01 00:00:00")
    assert(bucket("3 months", "2024-02-15 10:00:00") == "2024-01-01 00:00:00")
    assert(bucket("1 year", "2024-02-15 10:00:00") == "2024-01-01 00:00:00")
  }

  test("pre-origin timestamps bucket correctly (floorMod)") {
    assert(bucket("1 day", "1999-12-31 10:00:00") == "1999-12-31 00:00:00")
  }
}
