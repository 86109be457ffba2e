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
}
