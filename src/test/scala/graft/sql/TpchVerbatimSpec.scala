package graft.sql

import graft.SparkSpec

/** The reference's own TPC-H benchmark corpus, executed verbatim
  * (reference `extension/tpch/dbgen/queries/q01..q22.sql`) over the
  * staged dbgen fixtures. The DuckDB oracle gate is the value check
  * (tpch_q01..q22, both scales); this spec pins the harness itself:
  * query loading, scale routing, row counts, and the q18 auto-name. */
class TpchVerbatimSpec extends SparkSpec {

  // Row counts measured from DuckDB over the same sf0.01 dbgen corpus —
  // a load/translate/fixture regression moves at least one of these.
  private val expectedRows = Map(
    1 -> 4, 2 -> 4, 3 -> 10, 4 -> 5, 5 -> 5, 6 -> 1, 7 -> 4, 8 -> 2,
    9 -> 173, 10 -> 20, 11 -> 359, 12 -> 2, 13 -> 32, 14 -> 1, 15 -> 1,
    16 -> 296, 17 -> 1, 18 -> 2, 19 -> 1, 20 -> 1, 21 -> 1, 22 -> 7)

  test("all 22 verbatim reference queries run and match pinned sf0.01 row counts") {
    (1 to 22).foreach { n =>
      val df = TpchVerbatim.run(spark, sf(), n)
      assert(df.count() === expectedRows(n), s"q$n row count")
    }
  }

  test("query texts load verbatim: semicolon stripped, no rewriting of the body") {
    val q1 = TpchVerbatim.queryText(1)
    assert(!q1.endsWith(";"))
    assert(q1.contains("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge"))
    val ref = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths
      .get(TpchVerbatim.queriesDir, "q06.sql")), "UTF-8").trim.stripSuffix(";")
    assert(TpchVerbatim.queryText(6) === ref, "texts are the reference's, unmodified")
  }

  test("scale routing follows the testdata dir basename") {
    assert(TpchVerbatim.scaleFor("/root/testdata/sf0.1") === "sf0.1")
    assert(TpchVerbatim.scaleFor("/root/testdata/sf0.01") === "sf0.01")
    assert(TpchVerbatim.scaleFor("/root/testdata/sf0.001") === "sf0.01")
  }

  test("q18's unaliased sum keeps the engine-agreed auto-name") {
    val df = TpchVerbatim.run(spark, sf(), 18)
    assert(df.columns.contains("sum(l_quantity)"),
      s"got ${df.columns.mkString(",")}")
  }

  test("oracle texts bind all 8 tables (partsupp included) and shim only q12") {
    val o11 = TpchVerbatim.oracleText(11)
    TpchVerbatim.tables.foreach(t => assert(o11.contains(s"$t AS (SELECT")))
    assert(o11.contains("partsupp.parquet"))
    assert(TpchVerbatim.oracleText(12).contains("CAST(high_line_count AS BIGINT)"))
    assert(!TpchVerbatim.oracleText(1).contains("CAST(high_line_count"))
  }
}
