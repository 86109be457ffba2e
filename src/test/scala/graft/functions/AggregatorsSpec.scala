package graft.functions

import graft.SparkSpec
import graft.functions.{GraftFunctions => G}
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("entropy of a uniform distribution is log2(n)") {
    val df = Seq("a", "b", "c", "d", "a", "b", "c", "d").toDF("v")
    val e = df.agg(G.entropy($"v")).head.getDouble(0)
    assert(math.abs(e - 2.0) < 1e-12)
  }

  test("entropy of a constant column is 0") {
    val e = Seq("x", "x", "x").toDF("v").agg(G.entropy($"v")).head.getDouble(0)
    assert(e == 0.0)
  }

  test("entropy matches closed form on skewed data") {
    // 3:1 split → H = -(3/4 log2 3/4 + 1/4 log2 1/4)
    val e = Seq("a", "a", "a", "b").toDF("v").agg(G.entropy($"v")).head.getDouble(0)
    val expected = -(0.75 * math.log(0.75) / math.log(2) + 0.25 * math.log(0.25) / math.log(2))
    assert(math.abs(e - expected) < 1e-12)
  }

  test("entropy distributes across partitions (merge path)") {
    val df = spark.range(0, 1000, 1, 8).select(($"id" % 10).cast("string").as("v"))
    val e = df.agg(G.entropy($"v")).head.getDouble(0)
    assert(math.abs(e - math.log(10) / math.log(2)) < 1e-12)
  }

  test("histogram_map returns per-value counts") {
    val m = Seq("a", "b", "a", "c", "a").toDF("v")
      .agg(G.histogram_map($"v")).head.getMap[String, Long](0)
    assert(m("a") == 3L && m("b") == 1L && m("c") == 1L)
  }
}
