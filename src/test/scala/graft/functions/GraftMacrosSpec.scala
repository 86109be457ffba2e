package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Macro layer (reference `CREATE MACRO` /
  * `scalar_macro_function.cpp` analog): registration, plan-time
  * expansion (the macro's expression participates in pushdown —
  * inlining, not an opaque UDF), redefinition, and unknown-name
  * errors. */
class GraftMacrosSpec extends SparkSpec {
  import spark.implicits._

  test("scalar macro expands to the same result as its inline body") {
    val li = graft.Tables.t(spark, sf(), "lineitem")
    val viaMacro = li.select(
        sum(GraftMacros.m("discounted_price", $"l_extendedprice", $"l_discount"))
          .cast("double").as("r"))
      .head.getDouble(0)
    val inline = li.select(
        sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
          .cast("double").as("r"))
      .head.getDouble(0)
    assert(viaMacro == inline)
  }

  test("macro expression is inlined into the plan, not an opaque UDF") {
    val li = graft.Tables.t(spark, sf(), "lineitem")
    val plan = li.select(GraftMacros.m("money", $"l_quantity").as("q"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }

  test("table macro returns the parameterized slice") {
    val recent = GraftMacros.table("recent_orders", spark, sf())
    val expected = graft.Tables.t(spark, sf(), "orders")
      .filter($"o_orderdate" >= lit("1998-01-01").cast("timestamp")).count()
    assert(recent.count() == expected && expected > 0)
  }

  test("redefinition is latest-wins; unknown macro raises") {
    GraftMacros.registerScalar("twice", { case Seq(c) => c * 2 })
    assert(Seq(3L).toDF("x").select(GraftMacros.m("twice", $"x")).head.getLong(0) == 6L)
    GraftMacros.registerScalar("twice", { case Seq(c) => c * 2 + 1 })
    assert(Seq(3L).toDF("x").select(GraftMacros.m("twice", $"x")).head.getLong(0) == 7L)
    GraftMacros.dropScalar("twice")
    intercept[NoSuchElementException](GraftMacros.m("twice", lit(1)))
  }
}
