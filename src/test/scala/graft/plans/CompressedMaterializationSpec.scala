package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.plans.{CompressedMaterialization => CM}

/** Compressed materialization (reference
  * `src/optimizer/compressed_materialization.cpp` analog): the packed
  * composite key must be a bijection on 32-bit inputs (including
  * negatives), the packed groupBy must equal the plain groupBy, and the
  * range guard must fail loudly instead of corrupting. */
class CompressedMaterializationSpec extends SparkSpec {
  import spark.implicits._

  test("pack/unpack round-trips, including negative keys") {
    val pairs = Seq((0L, 0L), (1L, -1L), (-5L, 7L),
      (Int.MaxValue.toLong, Int.MinValue.toLong), (123456789L, -987654321L))
    val df = pairs.toDF("a", "b")
      .withColumn("p", CM.packPair($"a", $"b"))
      .select(CM.unpackA($"p").as("a2"), CM.unpackB($"p").as("b2"))
    assert(df.as[(Long, Long)].collect().toSeq == pairs)
  }

  test("packed keys are distinct for distinct pairs") {
    val df = Seq((1L, 2L), (2L, 1L), (-1L, 2L), (1L, -2L), (0L, 0L))
      .toDF("a", "b").select(CM.packPair($"a", $"b").as("p"))
    assert(df.distinct().count() == 5)
  }

  test("packed groupBy equals plain groupBy") {
    val li = graft.Tables.t(spark, sf(), "lineitem")
    val packed = CM.groupByPacked(li, "l_partkey", "l_suppkey",
        Seq(count(lit(1)).as("n"),
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("qty")))
      .orderBy($"l_partkey", $"l_suppkey")
      .select($"l_partkey", $"l_suppkey", $"n", $"qty")
    val plain = li.groupBy($"l_partkey", $"l_suppkey")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("qty"))
      .orderBy($"l_partkey", $"l_suppkey")
      .select($"l_partkey", $"l_suppkey", $"n", $"qty")
    assert(packed.collect().toSeq == plain.collect().toSeq)
  }

  test("out-of-range key fails loudly, never corrupts") {
    val bad = Seq((Int.MaxValue.toLong + 1, 0L)).toDF("a", "b")
      .select(CM.packPair($"a", $"b").as("p"))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage != null)
  }

  private def groupsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (Option(r.get(0)), Option(r.get(1)),
      r.getLong(r.fieldIndex("n")))).toSet

  test("auto packing: offset compression handles >32-bit keys with small ranges") {
    // absolute values far beyond 32 bits; RANGES are tiny → must pack
    val df = Seq.tabulate(1000)(i =>
      (5_000_000_000L + i % 7, 9_000_000_000L + i % 11)).toDF("a", "b")
    val auto = CM.groupByPackedAuto(df, "a", "b", Seq(count(lit(1)).as("n")))
    val plain = df.groupBy($"a", $"b").agg(count(lit(1)).as("n"))
    assert(groupsOf(auto) == groupsOf(plain))
    assert(auto.queryExecution.optimizedPlan.toString.contains("_packed"),
      "small-range keys must take the packed path")
  }

  test("auto packing: NULL keys group exactly like plain groupBy (sentinel slot)") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (1L, 10L), (null, 10L), (null, null), (2L, null), (null, 10L))
      .toDF("a", "b")
    val auto = CM.groupByPackedAuto(df, "a", "b", Seq(count(lit(1)).as("n")))
    val plain = df.groupBy($"a", $"b").agg(count(lit(1)).as("n"))
    assert(groupsOf(auto) == groupsOf(plain))
  }

  test("auto packing: uncompressible ranges fall back to plain groupBy, never abort") {
    // combined ranges need 2×63 bits → the stats gate must refuse to pack
    val df = Seq((Long.MinValue + 1, 0L), (Long.MaxValue, Long.MinValue + 1),
      (0L, Long.MaxValue)).toDF("a", "b")
    val auto = CM.groupByPackedAuto(df, "a", "b", Seq(count(lit(1)).as("n")))
    assert(!auto.queryExecution.optimizedPlan.toString.contains("_packed"))
    assert(auto.count() == 3)
    // the round-9 regression shape: sparse 10×-inflated fixture keys
    val sparse = Seq.tabulate(100)(i =>
      (i.toLong * 1_000_000_000L, i.toLong * 3_000_000_000L)).toDF("a", "b")
    val auto2 = CM.groupByPackedAuto(sparse, "a", "b", Seq(count(lit(1)).as("n")))
    assert(auto2.count() == 100) // executes; no assert_true abort anywhere
  }

  test("auto packing preserves the original key types") {
    val df = Seq((1, 10L), (2, 20L)).toDF("a", "b") // a is INT
    val auto = CM.groupByPackedAuto(df, "a", "b", Seq(count(lit(1)).as("n")))
    assert(auto.schema("a").dataType.typeName == "integer")
    assert(auto.schema("b").dataType.typeName == "long")
  }
}
