package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IEJoinSpec extends SparkSpec {
  import spark.implicits._

  // suite sessions may predate the extension — inject per-session
  private lazy val s = {
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ GraftIEJoinStrategy(spark)
    spark
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("IEJoinExec is planned for 2-inequality inner joins and matches BNLJ") {
    val a = (1 to 200).map(i => (i.toLong, (i * 7 % 100).toLong)).toDF("a1", "b1")
    val b = (1 to 150).map(i => ((i * 3 % 120).toLong, (i * 11 % 90).toLong)).toDF("a2", "b2")

    for ((o1, o2) <- Seq(("<", ">"), ("<=", ">="), (">", "<"), (">=", "<="))) {
      val cond = expr(s"a1 $o1 a2 AND b1 $o2 b2")
      s.conf.set("spark.graft.iejoin", "true")
      val fast = a.join(b, cond)
      assert(planOf(fast).contains("IEJoin"), s"no IEJoinExec for $o1/$o2:\n${planOf(fast)}")
      val got = fast.collect().map(_.toSeq).toSet

      s.conf.set("spark.graft.iejoin", "false")
      val slow = a.join(b, cond)
      assert(!planOf(slow).contains("IEJoin"))
      val want = slow.collect().map(_.toSeq).toSet
      assert(got == want, s"mismatch for $o1/$o2: ${got.size} vs ${want.size} rows")
      assert(want.nonEmpty)
    }
    s.conf.set("spark.graft.iejoin", "true")
  }

  test("reversed operand order and doubles") {
    s.conf.set("spark.graft.iejoin", "true")
    val a = Seq((1.5, 10.0), (2.5, 20.0), (3.5, 30.0)).toDF("x", "y")
    val b = Seq((2.0, 25.0), (3.0, 15.0)).toDF("u", "v")
    // operands written right-side-first: u > x AND v < y → normalized internally
    val df = a.join(b, expr("u > x AND v < y"))
    assert(planOf(df).contains("IEJoin"))
    val got = df.collect().map(_.toSeq).toSet
    s.conf.set("spark.graft.iejoin", "false")
    val want = a.join(b, expr("u > x AND v < y")).collect().map(_.toSeq).toSet
    s.conf.set("spark.graft.iejoin", "true")
    assert(got == want && got.nonEmpty)
  }

  test("null keys never match") {
    s.conf.set("spark.graft.iejoin", "true")
    val a = Seq((Some(1L), Some(1L)), (None, Some(5L)), (Some(9L), None))
      .toDF("a1", "b1")
    val b = Seq((Some(5L), Some(0L))).toDF("a2", "b2")
    val df = a.join(b, expr("a1 < a2 AND b1 > b2"))
    assert(planOf(df).contains("IEJoin"))
    assert(df.collect().map(_.toSeq).toSet == Set(Seq(1L, 1L, 5L, 0L)))
  }

  test("empty sides") {
    s.conf.set("spark.graft.iejoin", "true")
    val a = Seq((1L, 1L)).toDF("a1", "b1").filter(lit(false))
    val b = Seq((5L, 0L)).toDF("a2", "b2")
    assert(a.join(b, expr("a1 < a2 AND b1 > b2")).count() == 0)
    assert(b.join(a, expr("a2 < a1 AND b2 > b1")).count() == 0)
  }

  test("equality or mixed conditions do NOT use IEJoin") {
    s.conf.set("spark.graft.iejoin", "true")
    val a = Seq((1L, 1L)).toDF("a1", "b1")
    val b = Seq((1L, 0L)).toDF("a2", "b2")
    assert(!planOf(a.join(b, expr("a1 = a2 AND b1 > b2"))).contains("IEJoin"))
    assert(!planOf(a.join(b, expr("a1 < a2"))).contains("IEJoin"))
  }
}
