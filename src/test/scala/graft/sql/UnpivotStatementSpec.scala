package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The UNPIVOT statement front-end: grammar coverage, NULL-cell
  * exclusion, column order, and loud refusals. Value parity with DuckDB
  * is pinned by the `ducksql_unpivot_stmt` oracle entry. */
class UnpivotStatementSpec extends SparkSpec {

  test("bare table source unpivots the ON list, passing other columns through") {
    val df = DuckDialect.run(spark, sf(),
      "UNPIVOT region ON r_name INTO NAME k VALUE v")
    assert(df.columns.toSeq == Seq("r_regionkey", "k", "v"))
    val regions = graft.Tables.t(spark, sf(), "region").count()
    assert(df.count() == regions)
    assert(df.select("k").distinct().collect().map(_.getString(0))
      .toSeq == Seq("r_name"))
  }

  test("subquery source; value column takes the common coerced type") {
    val df = DuckDialect.run(spark, sf(),
      """UNPIVOT (SELECT l_orderkey, l_quantity, l_tax FROM lineitem WHERE l_orderkey < 10)
        |ON l_quantity, l_tax INTO NAME m VALUE x""".stripMargin)
    assert(df.columns.toSeq == Seq("l_orderkey", "m", "x"))
    assert(df.schema("x").dataType.typeName == "double")
  }

  test("NULL cells drop (DuckDB default), non-NULL siblings survive") {
    val df = DuckDialect.run(spark, sf(),
      """UNPIVOT (SELECT r_regionkey AS id, r_regionkey * 10 AS a,
        |         CASE WHEN r_regionkey = 0 THEN NULL ELSE r_regionkey END AS b
        |         FROM region)
        |ON a, b INTO NAME m VALUE v""".stripMargin)
    val regions = graft.Tables.t(spark, sf(), "region").count()
    assert(df.count() == regions * 2 - 1, "exactly the one NULL cell drops")
    assert(df.filter(col("id") === 0 && col("m") === "b").count() == 0)
  }

  test("refusals: aliases, COLUMNS(*), multi-column VALUE") {
    for (bad <- Seq(
        "UNPIVOT region ON r_name AS 'n' INTO NAME k VALUE v",
        "UNPIVOT region ON COLUMNS('r_.*') INTO NAME k VALUE v",
        "UNPIVOT region ON r_name INTO NAME k VALUE v, w")) {
      val e = intercept[DuckDialect.GraftSqlException](
        DuckDialect.run(spark, sf(), bad))
      assert(e.getMessage.contains("UNPIVOT"), s"wrong refusal for: $bad")
    }
  }
}
