package graft.sql

import graft.SparkSpec

/** The reference's own TPC-DS benchmark corpus, executed verbatim
  * (reference `extension/tpcds/dsdgen/queries/01.sql..99.sql`) over the
  * staged dsdgen fixtures. The DuckDB oracle gate is the value check
  * for all 99 (tpcds_q01..q99, both scales); this spec pins the harness
  * itself: query loading, the positional c0..cN rename both sides rely
  * on, the WITH-merge in the oracle binder, the meta probe, and row
  * counts for a grammar-covering subset (CTE chains, set ops, ROLLUP,
  * windows, the HUGEINT/decimal comparison shims). */
class TpcdsVerbatimSpec extends SparkSpec {

  // sf0.01 row counts from the staging-time DuckDB probe (meta.json) —
  // re-pinned here literally so a silent re-stage drift ALSO fails.
  private val expectedRows = Map(
    1 -> 100,  // WITH + correlated avg subquery
    2 -> 1974, // two-CTE chain, UNION ALL inside
    8 -> 0,    // substr + IN-subquery ∩ EXCEPT-shaped customer filter
    14 -> 100, // triple-channel INTERSECT CTE + grouping sets
    18 -> 45,  // ROLLUP + avg(CAST AS DECIMAL) — the q18 oracle shim
    21 -> 5,   // HUGEINT sum columns — the BIGINT oracle shim
    22 -> 100, // ROLLUP over inventory
    38 -> 1,   // three-way INTERSECT
    51 -> 100, // window over full outer join of cumulative sums
    67 -> 100, // rank() over rollup partitions
    87 -> 1)   // three-way EXCEPT

  test("verbatim reference queries run and match pinned sf0.01 row counts") {
    expectedRows.toSeq.sortBy(_._1).foreach { case (n, want) =>
      val df = TpcdsVerbatim.run(spark, sf("sf0.01"), n)
      assert(df.count() === want, s"tpcds q$n row count")
    }
  }

  test("engine-side round-grid shims emit DOUBLE on the shimmed columns") {
    // types must match the oracle's CAST(ROUND(..) AS DOUBLE) exactly:
    // the driver's hash is on native values, so decimal-vs-double is a
    // fail even when every value agrees ("4.00" vs "4.0", r17 q78).
    import org.apache.spark.sql.types.DoubleType
    val s18 = TpcdsVerbatim.run(spark, sf("sf0.01"), 18).schema
    (4 to 10).foreach(i => assert(s18(s"c$i").dataType === DoubleType))
    val s61 = TpcdsVerbatim.run(spark, sf("sf0.01"), 61).schema
    (0 to 2).foreach(i => assert(s61(s"c$i").dataType === DoubleType))
    val s78 = TpcdsVerbatim.run(spark, sf("sf0.01"), 78).schema
    assert(s78("c3").dataType === DoubleType)
    assert(s78("c4").dataType !== DoubleType, "unshimmed columns untouched")
  }

  test("result columns rename positionally to c0..cN on the engine side") {
    val df = TpcdsVerbatim.run(spark, sf("sf0.01"), 2)
    assert(df.columns.toSeq === (0 until 8).map(i => s"c$i"),
      "q2's last column is an unaliased round() — both sides must agree " +
        "on positional names")
  }

  test("query texts load verbatim: semicolon stripped, body unmodified") {
    val ref = new String(java.nio.file.Files.readAllBytes(java.nio.file
      .Paths.get(TpcdsVerbatim.queriesDir, "03.sql")), "UTF-8")
      .trim.stripSuffix(";")
    assert(TpcdsVerbatim.queryText(3) === ref)
  }

  test("oracle binder merges the 24 table CTEs into a WITH-starting query") {
    val o1 = TpcdsVerbatim.oracleText(1) // 01.sql starts WITH
    TpcdsVerbatim.tables.foreach(t =>
      assert(o1.contains(s"$t AS (SELECT * FROM read_parquet")))
    // the query's own CTE follows the binds in ONE with-list
    assert(o1.contains(", customer_total_return AS"), o1.take(400))
    assert(!o1.matches("(?s).*WITH.*\\bWITH\\b.*"), "no nested WITH emitted")
    // non-WITH queries get the plain prefix + the positional wrapper
    val o3 = TpcdsVerbatim.oracleText(3)
    assert(o3.contains(") AS graft_t(c0") &&
      o3.contains("web_site.parquet')) SELECT"), o3.takeRight(120))
  }

  test("comparison shims: HUGEINT->BIGINT (q21), round-grid (q18/q61/q78) — and only there") {
    val o21 = TpcdsVerbatim.oracleText(21)
    assert(o21.contains("CAST(c2 AS BIGINT) AS c2") &&
      o21.contains("CAST(c3 AS BIGINT) AS c3"))
    // both-engines-on-one-grid: ROUND(x, k) AS DOUBLE (r17 verdict item 1)
    val o18 = TpcdsVerbatim.oracleText(18)
    (4 to 10).foreach(i =>
      assert(o18.contains(s"CAST(ROUND(c$i, 3) AS DOUBLE) AS c$i")))
    val o61 = TpcdsVerbatim.oracleText(61)
    (0 to 2).foreach(i =>
      assert(o61.contains(s"CAST(ROUND(c$i, 2) AS DOUBLE) AS c$i")))
    val o78 = TpcdsVerbatim.oracleText(78)
    assert(o78.contains("CAST(ROUND(c3, 2) AS DOUBLE) AS c3"))
    assert(!o78.contains("ROUND(c4"), "q78 shims only the ratio column")
    val o3 = TpcdsVerbatim.oracleText(3)
    assert(!o3.contains("CAST(c"), "q3 has no shim columns")
  }

  test("scale routing follows the testdata dir basename") {
    assert(TpcdsVerbatim.scaleFor("/root/testdata/sf0.1") === "sf0.1")
    assert(TpcdsVerbatim.scaleFor("/root/testdata/sf0.01") === "sf0.01")
    assert(TpcdsVerbatim.scaleFor("/anything/else") === "sf0.01")
  }
}
