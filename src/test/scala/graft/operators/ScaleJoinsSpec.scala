package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("bandJoin equals the naive theta join") {
    val a = Seq((1L, 10L), (1L, 100L), (2L, 50L)).toDF("k", "x")
    val b = Seq((1L, 12L), (1L, 200L), (2L, 58L), (3L, 50L)).toDF("k2", "y")
    val banded = ScaleJoins.bandJoin(a, b, $"x", $"y", width = 10L,
        extraCond = $"k" === $"k2")
      .select($"k", $"x", $"y").collect().toSet
    val naive = a.join(b, $"k" === $"k2" && abs($"x" - $"y") <= 10L)
      .select($"k", $"x", $"y").collect().toSet
    assert(banded == naive)
    assert(banded.nonEmpty)
  }

  test("bandJoin at exact bucket boundaries") {
    val a = Seq((1L, 0L), (1L, 10L), (1L, 20L)).toDF("k", "x")
    val b = Seq((1L, 10L)).toDF("k2", "y")
    val banded = ScaleJoins.bandJoin(a, b, $"x", $"y", width = 10L,
        extraCond = $"k" === $"k2")
      .select($"x").collect().map(_.getLong(0)).toSet
    assert(banded == Set(0L, 10L, 20L)) // all within |x-10| <= 10
  }

  test("saltedJoin equals plain equi-join and spreads partitions") {
    val probe = spark.range(0, 10000).select((lit(7L)).as("k"), $"id") // one hot key
    val build = Seq((7L, "hot"), (8L, "cold")).toDF("k", "v")
    val salted = ScaleJoins.saltedJoin(probe, build, "k", salt = 8)
    val plain = probe.join(build, "k")
    assert(salted.count() == plain.count())
    assert(salted.agg(sum($"id")).head.getLong(0) ==
      plain.agg(sum($"id")).head.getLong(0))
  }
}
