package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.Row

/** The SUMMARIZE statement front-end: one row per source column, DuckDB
  * 1.0.0 SUMMARIZE schema, exact stats. Value-level parity with DuckDB
  * is pinned by the `ducksql_summarize` oracle entry; here we pin the
  * expansion itself: schema, per-type behavior (numeric vs not), null
  * accounting, and the single-scan plan shape.
  */
class SummarizeSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "a"), (2L, 20.0, "b"), (3L, null, "b"), (4L, 40.0, null))
      .toDF("id", "v", "s")
  }

  test("schema mirrors DuckDB SUMMARIZE; one row per column") {
    val out = Summarize.summarize(df)
    assert(out.columns.toSeq == Seq("column_name", "column_type", "min",
      "max", "approx_unique", "avg", "std", "q25", "q50", "q75", "count",
      "null_percentage"))
    assert(out.count() == 3)
  }

  test("numeric columns get moments and quantiles; strings get NULLs") {
    val rows = Summarize.summarize(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val id = rows("id")
    assert(id.getString(1) == "BIGINT")
    assert(id.getString(2) == "1" && id.getString(3) == "4")
    assert(id.getLong(4) == 4L)            // exact unique
    assert(id.getDouble(5) == 2.5)         // avg
    assert(id.getDouble(8) == 2.5)         // q50
    assert(id.getLong(10) == 4L)           // count = total rows
    assert(id.getDouble(11) == 0.0)        // null_percentage
    val v = rows("v")
    assert(v.getString(1) == "DOUBLE")
    assert(v.getDouble(11) == 25.0)        // 1 of 4 null
    assert(v.getDouble(8) == 20.0)         // median of {10,20,40}
    val s = rows("s")
    assert(s.getString(1) == "VARCHAR")
    assert(s.getString(2) == "a" && s.getString(3) == "b")
    assert(s.getLong(4) == 2L)
    assert(s.isNullAt(5) && s.isNullAt(6) && s.isNullAt(7))
    assert(s.getDouble(11) == 25.0)
  }

  test("statement forms: bare table name and SELECT both accepted") {
    val byName = Summarize.run(spark, sf(), "SUMMARIZE nation")
    val bySelect =
      Summarize.run(spark, sf(), "SUMMARIZE SELECT * FROM nation")
    assert(byName.collect().toSet == bySelect.collect().toSet)
    assert(byName.count() == 3) // nation has 3 columns → 3 summary rows
  }

  test("one scan regardless of column count (no per-column rescan)") {
    val plan = Summarize.summarize(df).queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.length == 1, s"expected a single source scan, got:\n$plan")
  }

  test("every fixture table summarizes (timestamps, arrays, structs included)") {
    for (t <- graft.Tables.names) {
      val out = Summarize.run(spark, sf(), s"SUMMARIZE $t")
      val nCols = graft.Tables.t(spark, sf(), t).columns.length
      assert(out.count() == nCols, s"$t: one summary row per column")
    }
  }

  test("DESCRIBE: DuckDB schema projection, no scan, both statement forms") {
    val d1 = DuckDialect.run(spark, sf(), "DESCRIBE nation")
    assert(d1.columns.toSeq ==
      Seq("column_name", "column_type", "null", "key", "default", "extra"))
    assert(d1.count() == 3)
    val d2 = DuckDialect.run(spark, sf(),
      "DESCRIBE SELECT n_name, n_regionkey * 2 AS k2 FROM nation")
    val rows = d2.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(rows("n_name") == "VARCHAR")
    assert(rows("k2") == "INTEGER" || rows("k2") == "BIGINT")
    // metadata only: the plan must not contain a parquet scan job —
    // collect() of a local relation
    assert(d1.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
  }

  test("DuckDialect.run routes SUMMARIZE here; translate refuses with pointer") {
    val out = DuckDialect.run(spark, sf(), "SUMMARIZE region")
    assert(out.count() == 2) // region has 2 columns in the fixture
    val e = intercept[DuckDialect.GraftSqlException](
      DuckDialect.translate("SUMMARIZE region"))
    assert(e.getMessage.contains("DuckDialect.run"))
  }
}
