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

  test("cb url-host top-n: regex key in scan stage, single aggregate, HAVING applied") {
    val df = OlapSuites.cbUrlHostTopn(spark, sf())
    val p = plan(df)
    assert(!p.contains("Join"))
    val scans = p.split("\n").count(_.trim.matches("""\(\d+\) Scan parquet.*"""))
    assert(scans == 1)
    val rows = df.collect()
    assert(rows.length <= 25)
    assert(rows.forall(_.getLong(2) >= 10), "HAVING count >= 10 must hold")
    val ls = rows.map(_.getDouble(1))
    assert(ls.sameElements(ls.sortBy(-_)), "avg-length order must hold")
  }

  test("cb wide sums: 90 accumulators ride ONE aggregate pass over ONE scan") {
    val df = OlapSuites.cbWideSums(spark, sf())
    val p = plan(df)
    assert(!p.contains("Join"))
    val scans = p.split("\n").count(_.trim.matches("""\(\d+\) Scan parquet.*"""))
    assert(scans == 1, "one scan for all 90 sums")
    // partial + final of ONE hash aggregate, not 90 passes
    val aggs = p.split("\n").count(_.trim.matches("""\(\d+\) HashAggregate.*"""))
    assert(aggs == 2, s"expected partial+final pair, got $aggs")
    val row = df.collect().head
    assert(row.length == 90)
    // SUM(x + k) = SUM(x) + k·n — verify the whole battery from s0 and n
    val n = graft.Tables.t(spark, sf(), "events").count()
    val s0 = row.getLong(0)
    (1 until 90).foreach(k => assert(row.getLong(k) == s0 + k * n, s"s$k"))
  }

  test("cb search phrases: pushed filters, distinct aggregate, ordered limit") {
    val df = OlapSuites.cbSearchPhrases(spark, sf())
    val p = plan(df)
    assert(!p.contains("Join"))
    // the three scan-stage predicates must run before the aggregate:
    // formatted plan shows them in a Filter above the single scan
    assert(p.contains("Contains") || p.contains("LIKE") || p.contains("like"),
      "LIKE predicates present in the scan stage")
    val rows = df.collect()
    assert(rows.length <= 10)
    val cs = rows.map(_.getLong(3))
    assert(cs.sameElements(cs.sortBy(-_)), "count order must hold")
    // recompute one group's (c, u) from the raw fixture
    import org.apache.spark.sql.functions._
    rows.headOption.foreach { r =>
      val lang = r.getString(0)
      val raw = graft.Tables.t(spark, sf(), "documents")
        .filter(col("text").like("%data%") && !col("source").like("%7%") &&
          col("lang") === lang)
      assert(raw.count() == r.getLong(3))
      assert(raw.select(col("n_chars")).distinct().count() == r.getLong(4))
    }
  }

  test("cb views offset: pagination window is deterministic and sorted") {
    val df = OlapSuites.cbViewsOffset(spark, sf())
    val rows = df.collect()
    assert(rows.length == 10)
    val cs = rows.map(_.getLong(2))
    assert(cs.sameElements(cs.sortBy(-_)), "page keeps the global order")
    // the page starts AFTER the top-25 of the same ordering: its best
    // count never beats the full ordering's 25th count
    import org.apache.spark.sql.functions._
    val full = graft.Tables.t(spark, sf(), "events")
      .select(col("event_type"), (col("user_id") % 20).as("ub"))
      .groupBy(col("event_type"), col("ub")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("event_type").asc, col("ub").asc)
      .limit(25).collect()
    assert(cs.head <= full.last.getLong(2))
  }

  test("h2o median+sd: no join, one aggregate at near-row group cardinality") {
    val df = OlapSuites.h2oMedianSd(spark, sf())
    val p = plan(df)
    assert(!p.contains("Join"))
    // exact percentile must NOT silently become approx
    assert(p.contains("percentile") && !p.contains("approx_percentile"))
    val n = df.count()
    val orders = graft.Tables.t(spark, sf(), "lineitem")
      .select("l_orderkey").distinct.count()
    assert(n == orders)
  }

  test("h2o join battery: small/medium broadcast, big 1:1 keeps row count") {
    val pSmall = plan(OlapSuites.h2oJoinSmall(spark, sf()))
    assert(pSmall.contains("BroadcastHashJoin"),
      "tiny-dim enrichment must broadcast")
    assert(!pSmall.contains("SortMergeJoin"))
    val pMed = plan(OlapSuites.h2oJoinMediumLeft(spark, sf()))
    assert(pMed.contains("BroadcastHashJoin"))
    // LEFT with a 1/3-selective build side: unmatched probe rows survive
    val med = OlapSuites.h2oJoinMediumLeft(spark, sf()).collect().head
    assert(med.getLong(0) > med.getLong(1),
      "some probe rows must be unmatched (NULL payload)")
    assert(med.getLong(1) > 0)
    // 1:1 self join neither inflates nor drops rows
    val big = OlapSuites.h2oJoinBig(spark, sf()).collect().head
    val orders = graft.Tables.t(spark, sf(), "orders").count()
    assert(big.getLong(0) == orders)
    assert(big.getDouble(1) == big.getDouble(2))
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
