package graft.sql

import graft.SparkSpec
import DuckDialect.GraftSqlException

/** COLUMNS(*) / COLUMNS('regex') schema-aware expansion pins. */
class ColumnsStarSpec extends SparkSpec {

  private def expand(sql: String): Option[String] =
    ColumnsStar.maybeExpand(spark, sf(), sql)

  test("bare COLUMNS expands to schema order; regex is an unanchored search") {
    assert(expand("SELECT a FROM t").isEmpty, "no COLUMNS → None")
    val all = expand("SELECT COLUMNS(*) FROM region").get
    assert(all.startsWith("SELECT r_regionkey, r_name "))
    // unanchored: 'name' matches r_name mid-string
    val re = expand("SELECT COLUMNS('name') FROM region").get
    assert(re.startsWith("SELECT r_name "))
  }

  test("aggregate-wrapped COLUMNS keeps original names (DuckDB naming)") {
    val e = expand(
      "SELECT min(COLUMNS('^l_(quantity|discount)$')) FROM lineitem").get
    assert(e.contains("min(l_quantity) AS l_quantity"))
    assert(e.contains("min(l_discount) AS l_discount"))
    // executes end-to-end through the run path
    val df = DuckDialect.run(spark, sf(),
      "SELECT l_returnflag, min(COLUMNS('^l_(quantity|discount)$')), count(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag")
    assert(df.columns.toSeq == Seq("l_returnflag", "l_quantity", "l_discount", "n"))
    assert(df.count() > 0)
  }

  test("translate alone expands COLUMNS via the ACTIVE session catalog") {
    // r13 verdict item 2: run() expanded what translate() refused — with
    // an active session that resolves the table, both faces now accept
    // the identical statement and agree value-for-value.
    import DuckSqlQueries.columnsRegexSql
    val viaRun = DuckDialect.run(spark, sf(), columnsRegexSql)
    graft.Tables.sql(spark, sf(), "SELECT 1") // registerAll: fixture views
    val viaTranslate = spark.sql(DuckDialect.translate(columnsRegexSql))
    assert(viaTranslate.columns.toSeq == viaRun.columns.toSeq)
    assert(viaTranslate.exceptAll(viaRun).isEmpty &&
      viaRun.exceptAll(viaTranslate).isEmpty)
    // a table the session catalog cannot resolve: the generic refusal
    val e = intercept[GraftSqlException](
      DuckDialect.translate("SELECT COLUMNS(*) FROM graft_absent_table"))
    assert(e.getMessage.contains("schema"))
    // truly sessionless: no expansion attempted, same loud refusal
    val active = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.clearActiveSession()
    try {
      val e2 = intercept[GraftSqlException](
        DuckDialect.translate("SELECT COLUMNS('name') FROM region"))
      assert(e2.getMessage.contains("schema"))
    } finally active.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
  }

  test("unsupported shapes refuse loudly") {
    def refused(sql: String, mention: String): Unit = {
      val e = intercept[GraftSqlException](expand(sql))
      assert(e.getMessage.contains(mention), s"got: ${e.getMessage}")
    }
    refused("SELECT COLUMNS('x') FROM region r JOIN nation n ON 1=1",
      "multiple relations")
    refused("SELECT COLUMNS('zzz_nomatch') FROM region", "matched no columns")
    refused("SELECT COLUMNS('^r_(name|regionkey)$') AS a FROM region", "alias")
    refused("SELECT COLUMNS(r_name) FROM region", "string literal")
    refused("SELECT DISTINCT COLUMNS('name') FROM region", "DISTINCT")
    refused("SELECT r_name FROM region WHERE COLUMNS('key') > 0",
      "outside the select list")
  }
}
