package graft.sql

import graft.SparkSpec

/** The PIVOT statement front-end: grammar coverage, implicit-group-key
  * discovery, count-cell zero-fill, and loud refusals for the naming
  * schemes we do not reproduce. Value parity with DuckDB is pinned by
  * the `pivot_stmt` / `pivot_stmt_sum` oracle entries. */
class PivotStatementSpec extends SparkSpec {

  test("bare table + explicit GROUP BY pivots on discovered values") {
    val df = DuckDialect.run(spark, sf(),
      "PIVOT orders ON o_orderstatus USING count(*) GROUP BY o_orderpriority")
    assert(df.columns.head == "o_orderpriority")
    assert(df.columns.length > 1)
    // count cells fill 0, never NULL (DuckDB pivot semantics)
    val nulls = df.columns.tail.map(c => df.filter(df(c).isNull).count()).sum
    assert(nulls == 0)
  }

  test("subquery source + implicit group keys (all columns not in ON/USING)") {
    val df = DuckDialect.run(spark, sf(),
      "PIVOT (SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem) " +
        "ON l_returnflag USING sum(l_quantity)")
    assert(df.columns.head == "l_linestatus",
      "l_linestatus is the only column left to group by")
    val statuses = graft.Tables.t(spark, sf(), "lineitem")
      .select("l_linestatus").distinct().count()
    assert(df.count() == statuses)
  }

  test("a source column named like an aggregate function stays a group key") {
    // 'sum' is a column name here; only identifiers followed by '(' are
    // function names — the column must survive implicit-group discovery
    val df = DuckDialect.run(spark, sf(),
      "PIVOT (SELECT l_returnflag, l_linestatus AS sum, l_quantity FROM lineitem) " +
        "ON l_returnflag USING sum(l_quantity)")
    assert(df.columns.head == "sum",
      s"column 'sum' must group, not vanish — got ${df.columns.toSeq}")
    val statuses = graft.Tables.t(spark, sf(), "lineitem")
      .select("l_linestatus").distinct().count()
    assert(df.count() == statuses)
  }

  test("refusals: multi-ON, IN lists, multi-agg, aliases, consumed columns") {
    def refused(stmt: String, mention: String): Unit = {
      val e = intercept[DuckDialect.GraftSqlException](
        DuckDialect.run(spark, sf(), stmt))
      assert(e.getMessage.contains(mention), e.getMessage)
    }
    refused("PIVOT orders ON o_orderstatus, o_orderpriority USING count(*)",
      "multiple ON columns")
    refused("PIVOT orders ON o_orderstatus IN ('F','O') USING count(*)",
      "IN value lists")
    refused("PIVOT orders ON o_orderstatus USING count(*), sum(o_totalprice)",
      "multiple USING aggregates")
    refused("PIVOT orders ON o_orderstatus USING count(*) AS n " +
      "GROUP BY o_orderpriority", "aliases")
    refused("PIVOT (SELECT l_returnflag, l_quantity FROM lineitem) " +
      "ON l_returnflag USING sum(l_quantity)", "no grouping columns")
  }

  test("USING expression goes through the dialect translator") {
    // len() is a DuckDB spelling; the translator renames it before expr()
    val df = DuckDialect.run(spark, sf(),
      "PIVOT (SELECT o_orderstatus, o_orderpriority FROM orders) " +
        "ON o_orderstatus USING count(*) GROUP BY o_orderpriority")
    assert(df.count() > 0)
  }
}
