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

  test("ieJoinBlocked equals the naive theta join (all op combinations)") {
    val x = (1 to 200).map(i => (i.toLong, (i * 7 % 101).toDouble, (i * 13 % 89).toDouble))
      .toDF("xid", "a1", "b1")
    val y = (1 to 150).map(i => (i.toLong, (i * 11 % 97).toDouble, (i * 5 % 83).toDouble))
      .toDF("yid", "a2", "b2")
    for ((opA, opB) <- Seq(("<", ">"), ("<=", ">="), (">", "<"), (">=", "<="))) {
      val blocked = ScaleJoins.ieJoinBlocked(x, y, "a1", "a2", opA, "b1", "b2", opB, blocks = 8)
        .select($"xid", $"yid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val cond = ScaleJoins.cmp($"a1", opA, $"a2") && ScaleJoins.cmp($"b1", opB, $"b2")
      val naive = x.join(y, cond)
        .select($"xid", $"yid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(blocked == naive, s"mismatch for $opA/$opB")
      assert(naive.nonEmpty)
    }
  }

  test("ieJoinBlocked handles null keys and empty feasible sets") {
    val x = Seq((1L, Some(1.0), Some(2.0)), (2L, None, Some(3.0))).toDF("xid", "a1", "b1")
    val y = Seq((1L, Some(5.0), Some(1.0)), (2L, Some(6.0), None)).toDF("yid", "a2", "b2")
    val r = ScaleJoins.ieJoinBlocked(x, y, "a1", "a2", "<", "b1", "b2", ">", blocks = 4)
      .select($"xid", $"yid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r == Set((1L, 1L))) // null keys never match
    // empty result when envelopes prune everything
    val x2 = Seq((1L, 1.0, 1.0)).toDF("xid", "a1", "b1")
    val y2 = Seq((1L, 5.0, 9.0)).toDF("yid", "a2", "b2")
    assert(ScaleJoins.ieJoinBlocked(x2, y2, "a1", "a2", "<", "b1", "b2", ">").count() == 0)
  }

  test("ieJoinBlocked plans no broadcast of data sides and no BNLJ") {
    val x = (1 to 500).map(i => (i.toLong, i.toDouble, (i % 89).toDouble)).toDF("xid", "a1", "b1")
    val y = (1 to 500).map(i => (i.toLong, (i % 97).toDouble, (i % 83).toDouble)).toDF("yid", "a2", "b2")
    val plan = ScaleJoins.ieJoinBlocked(x, y, "a1", "a2", "<", "b1", "b2", ">", blocks = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("join_skew_salt entry equals the unsalted join on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val salted = ScaleJoins.joinSkewSalt(spark, dir).collect().toSeq
    val li = graft.Tables.t(spark, dir, "lineitem")
    val sup = graft.Tables.t(spark, dir, "supplier")
    val plain = li.join(sup, $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy($"s_nationkey").collect().toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
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
