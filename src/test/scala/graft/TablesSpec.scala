package graft

import org.apache.spark.sql.functions._

/** r17 catalog-churn optimizations: the resolved-DataFrame cache and the
  * identity-checked temp-view registration must never change WHAT a name
  * resolves to — only skip provably-no-op work. */
class TablesSpec extends SparkSpec {

  test("t() returns the cached identical DataFrame per (session, path)") {
    val a = Tables.t(spark, sf(), "nation")
    val b = Tables.t(spark, sf(), "nation")
    assert(a eq b, "second resolve must be the cached handle")
    // a different path resolves independently
    val c = Tables.t(spark, sf("sf0.01"), "nation")
    assert(!(a eq c))
    assert(a.count() == c.count()) // same logical table either way
  }

  test("registerView skips the no-op re-register but detects clobbering") {
    val nation = Tables.t(spark, sf(), "nation")
    Tables.registerView(spark, "tables_spec_v", nation)
    val n = spark.table("tables_spec_v").count()
    assert(n > 0)
    // skip path: stored plan object unchanged => no replace (behaviorally
    // invisible; this is the fast path the gate takes 646 times)
    Tables.registerView(spark, "tables_spec_v", nation)
    assert(spark.table("tables_spec_v").count() == n)
    // CLOBBER: another module re-points the same name directly — the next
    // registerView must see the catalog changed and re-register, not skip
    spark.range(3).toDF("only_col").createOrReplaceTempView("tables_spec_v")
    assert(spark.table("tables_spec_v").columns.toSeq == Seq("only_col"))
    Tables.registerView(spark, "tables_spec_v", nation)
    assert(spark.table("tables_spec_v").count() == n,
      "clobbered view must be re-pointed at the registered DataFrame")
    assert(spark.table("tables_spec_v").columns.contains("n_nationkey"))
  }

  test("registerView re-registers when the DataFrame handle differs") {
    val v1 = spark.range(5).withColumn("tag", lit("one"))
    val v2 = spark.range(7).withColumn("tag", lit("two"))
    Tables.registerView(spark, "tables_spec_w", v1)
    assert(spark.table("tables_spec_w").count() == 5)
    Tables.registerView(spark, "tables_spec_w", v2)
    assert(spark.table("tables_spec_w").count() == 7)
  }
}
