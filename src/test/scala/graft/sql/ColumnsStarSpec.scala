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
