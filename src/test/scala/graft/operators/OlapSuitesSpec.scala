package graft.operators

import graft.SparkSpec

/** Plan pins for the db-benchmark / ClickBench suite analogs. */
class OlapSuitesSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("h2o six-key groupby: one aggregate exchange, no join, group count == row count") {
    val df = OlapSuites.h2oGroupbySix(spark, sf())
    val p = plan(df)
    assert(!p.contains("Join"), "a grouping battery has no joins")
    val scans = p.split("\n").count(_.trim.matches("""\(\d+\) Scan parquet.*"""))
    assert(scans == 1)
    // (orderkey, linenumber) is the row identity: grouping by six keys
    // that include it reduces NOTHING — the stress is the hash table
    val n = df.count()
    assert(n == graft.Tables.t(spark, sf(), "lineitem").count())
  }

  test("cb domain top-n: computed key aggregates once, ordered limit holds") {
    val df = OlapSuites.cbDomainTopn(spark, sf())
    val p = plan(df)
    val scans = p.split("\n").count(_.trim.matches("""\(\d+\) Scan parquet.*"""))
    assert(scans == 1)
    val rows = df.collect()
    assert(rows.length <= 3)
    // ordered by u desc then n desc
    val us = rows.map(_.getLong(1))
    assert(us.sameElements(us.sortBy(-_)), "top-n order must hold")
  }
}
