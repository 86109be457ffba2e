package graft.operators

import graft.SparkSpec

class TpchQueriesSpec extends SparkSpec {

  test("all 18 analog shapes execute on the smallest fixture") {
    // sf0.001 is 100× below the oracle scale: most filters match few or
    // zero rows there, which is exactly where data-dependent plans break
    // (empty broadcast sides, all-null aggregates, empty quantile sets).
    // Every shape must still produce its declared schema without throwing.
    TpchQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf("sf0.001"))
      assert(df.columns.nonEmpty, name)
      assert(df.count() >= 0, name) // forces full execution
    }
  }

  test("scalar-aggregate shapes return exactly one row even when empty") {
    // q6/q14/q17/q19 are ungrouped aggregates: SQL semantics give ONE row
    // (possibly null-valued) on empty input, and the oracle compares on
    // that — a 0-row frame here would hash-mismatch.
    for (name <- Seq("q6_forecast", "q14_promo", "q17_smallqty", "q19_disjunct")) {
      assert(TpchQueries.queries(name)(spark, sf("sf0.001")).count() == 1, name)
    }
  }
}
