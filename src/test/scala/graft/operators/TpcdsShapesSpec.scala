package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape pins for the TPC-DS families: each new shape asserts the
  * physical plan property that makes it scale (value correctness is the
  * Verify/oracle gate's job). */
class TpcdsShapesSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("correlated-EXISTS: semi join + mark joins, no cartesian product") {
    val df = TpcdsShapes.dsCorrelatedExists(spark, sf())
    val p = plan(df)
    assert(p.contains("LeftSemi"), "EXISTS must plan as a left semi join")
    assert(!p.contains("CartesianProduct"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the gate is at most the customers that have orders
    val withOrders = graft.Tables.t(spark, sf(), "orders")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum <= withOrders)
  }

  test("union+window: one union feeds the aggregate, window ranks within channel") {
    val df = TpcdsShapes.dsUnionWindow(spark, sf())
    val p = plan(df)
    assert(p.contains("Union"))
    assert(p.contains("Window"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // at most 3 ranked months per channel (ties can exceed via rank gaps,
    // but rk <= 3 bounds each channel's rows only if no ties — assert the
    // filter held instead)
    assert(rows.forall(_.getInt(4) <= 3))
  }

  test("rollup-over-join: dims broadcast, rollup expands grouping sets") {
    val df = TpcdsShapes.dsRollupJoin(spark, sf())
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), "nation/region must broadcast")
    assert(p.contains("Expand"), "rollup plans via Expand")
    val rows = df.collect()
    // grand total row present exactly once
    assert(rows.count(r => r.getString(0) == "ALL" && r.getString(1) == "ALL") == 1)
    val total = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
      .head.getLong(2)
    assert(total === graft.Tables.t(spark, sf(), "customer").count())
  }

  test("cumulative-compare: full outer join survives into the plan, windows follow") {
    val df = TpcdsShapes.dsCumulCompare(spark, sf())
    val p = plan(df)
    assert(p.contains("FullOuter"), "month series must full-outer join")
    assert(p.contains("Window"))
    // cumulative sums are monotone nondecreasing over months
    val rows = TpcdsShapes.dsCumulCompare(spark, sf("sf0.001")).collect()
    rows.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(2) >= 0.0))
  }

  test("year-over-year: self-join happens on the post-aggregate frame") {
    val df = TpcdsShapes.dsYearOverYear(spark, sf())
    val p = plan(df)
    assert(!p.contains("CartesianProduct"))
    val rows = df.collect()
    // every reported row is a genuine decline
    rows.foreach(r => assert(r.getDouble(4) > 0.0, "decline must be positive"))
  }

  test("intersect-chain: date filters push to the scans; result bounded by each leg") {
    val df = TpcdsShapes.dsIntersectChain(spark, sf())
    val p = plan(df)
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"),
      "year-range filters must reach the parquet scan")
    assert(!p.contains("CartesianProduct"))
    val n = df.collect().head.getLong(0)
    def leg(y: Int): Long = graft.Tables.t(spark, sf(), "orders")
      .filter(col("o_orderdate") >= to_date(lit(f"$y%04d-01-01")) &&
        col("o_orderdate") < to_date(lit(f"${y + 1}%04d-01-01")))
      .select("o_custkey").distinct().count()
    assert(n <= Seq(1996, 1997, 1998).map(leg).min)
    assert(n > 0, "fixture years 1996-1998 must overlap in customers")
  }
}
