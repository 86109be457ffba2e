package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FIXTURES.md §2 edge matrix: null keys in every join type, duplicate
  * keys (the chunk-factor > 1 compaction-trigger case, reference
  * `join_hashtable.cpp:513-565`), empty build/probe sides.
  * Mirrors reference sqllogictest inputs (`test/sql/join/inner/
  * test_join.test`: test(a,b) ⋈ test2(b,c)). */
class JoinEdgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val l = Seq(
    (Some(1), "a"), (Some(2), "b"), (None, "c"), (Some(4), "d"))
    .toDF("k", "lv")
  private lazy val r = Seq(
    (Some(1), "x"), (Some(1), "y"), (None, "z"), (Some(5), "w"))
    .toDF("k2", "rv")

  test("null keys never match in inner/semi/anti equi-joins") {
    val inner = l.join(r, $"k" === $"k2").collect()
    assert(inner.length == 2) // k=1 matches twice (dup key), null never
    val semi = l.join(r.withColumnRenamed("k2", "k"), Seq("k"), "left_semi")
    assert(semi.collect().map(_.getAs[Any]("lv")).toSet == Set("a"))
    val anti = l.join(r.withColumnRenamed("k2", "k"), Seq("k"), "left_anti")
    // null-key left rows are NOT matched → kept by anti join
    assert(anti.collect().map(_.getAs[String]("lv")).toSet == Set("b", "c", "d"))
  }

  test("outer joins null-extend unmatched and null-key rows") {
    val left = l.join(r, $"k" === $"k2", "left")
    assert(left.count() == 5) // 4 left rows, k=1 doubled
    assert(left.filter($"lv" === "c" && $"rv".isNull).count() == 1)
    val full = l.join(r, $"k" === $"k2", "full")
    // 2 matches + 3 left-only (b,c,d) + 2 right-only (z,w)
    assert(full.count() == 7)
  }

  test("null-safe equality (<=>) does match null keys") {
    val nse = l.join(r, $"k" <=> $"k2").collect()
    assert(nse.length == 3) // k=1 twice + null<=>null
  }

  test("duplicate build keys multiply probe rows (chunk factor > 1)") {
    val probe = spark.range(0, 1000).select(($"id" % 10).as("k"))
    val build = Seq.tabulate(30)(i => i % 10).toDF("k") // each key 3 times
    val out = probe.join(build, "k")
    assert(out.count() == 3000) // 3x amplification
  }

  test("empty build and empty probe sides") {
    val empty = l.filter(lit(false))
    assert(l.join(empty.withColumnRenamed("k", "k9"), $"k" === $"k9").count() == 0)
    assert(empty.join(r, $"k" === $"k2").count() == 0)
    assert(l.join(empty.select($"k".as("k9")), $"k" === $"k9", "left").count() == l.count())
  }

  test("null and duplicate group keys in aggregation") {
    val g = l.groupBy($"k").agg(count(lit(1)).as("n")).collect()
      .map(row => (if (row.isNullAt(0)) -1 else row.getInt(0)) -> row.getLong(1)).toMap
    assert(g(-1) == 1L) // null forms its own group
    assert(g(1) == 1L && g.size == 4)
  }

  test("set ops treat null as equal to null (distinct semantics)") {
    val a = Seq(Some(1), None, None).toDF("v")
    val b = Seq(Option.empty[Int], Some(2)).toDF("v")
    assert(a.intersect(b).collect().map(r =>
      if (r.isNullAt(0)) -1 else r.getInt(0)).toSet == Set(-1))
    assert(a.union(b).distinct().count() == 3) // 1, null, 2
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("reservoir returns exactly k distinct rows, deterministic per seed") {
    val df = graft.Tables.t(spark, sf(), "lineitem")
    val s1 = Sampling.reservoir(df, 100).collect()
    val s2 = Sampling.reservoir(df, 100).collect()
    assert(s1.length == 100)
    assert(s1.map(_.toSeq).toSet == s2.map(_.toSeq).toSet) // same seed → same sample
    val s3 = Sampling.reservoir(df, 100, seed = 7L).collect()
    assert(s1.map(_.toSeq).toSet != s3.map(_.toSeq).toSet)
    // plans as top-k, not a global sort
    val plan = Sampling.reservoir(df, 100).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("k larger than the frame returns everything") {
    val tiny = graft.Tables.t(spark, sf(), "region")
    assert(Sampling.reservoir(tiny, 100).count() == tiny.count())
  }
}

/** Window frame edges: ROWS vs RANGE × preceding/following bounds
  * (reference `window_expression.hpp:16-27`). */
class WindowEdgeSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.expressions.Window

  private lazy val df = Seq((1, 10), (1, 20), (1, 20), (1, 40))
    .toDF("g", "x")

  test("ROWS frame counts physical rows; RANGE frame counts peers") {
    val byX = Window.partitionBy($"g").orderBy($"x")
    val rows = byX.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val range = byX.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val out = df.select($"x",
      count(lit(1)).over(rows).as("nr"),
      count(lit(1)).over(range).as("ng")).orderBy($"x").collect()
    // duplicate x=20: ROWS distinguishes (2,3), RANGE gives both 3 (peers)
    assert(out.map(_.getLong(1)).toSeq == Seq(1, 2, 3, 4))
    assert(out.map(_.getLong(2)).toSeq == Seq(1, 3, 3, 4))
  }

  test("bounded following frames") {
    val w = Window.partitionBy($"g").orderBy($"x").rowsBetween(0, 1)
    val out = df.select($"x", sum($"x").over(w).as("s")).orderBy($"x").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(30, 40, 60, 40))
  }

  test("RANGE with value offset bounds") {
    val w = Window.partitionBy($"g").orderBy($"x").rangeBetween(-10, 0)
    val out = df.select($"x", count(lit(1)).over(w).as("n")).orderBy($"x").collect()
    // x=10:{10}; x=20:{10,20,20}; x=20:same; x=40:{40} (30 missing)
    assert(out.map(_.getLong(1)).toSeq == Seq(1, 3, 3, 1))
  }
}

/** §1.2 type-mapping edges: DECIMAL/TIMESTAMP/ARRAY/MAP/STRUCT round-trip
  * through parquet with value fidelity. */
class TypeEdgeSpec extends SparkSpec {
  import spark.implicits._

  private val tmp = java.nio.file.Files.createTempDirectory("graft-types").toString

  test("decimal, timestamp, array, map, struct round-trip parquet") {
    val df = spark.sql(
      """SELECT CAST(12345.6789 AS DECIMAL(18,4)) AS dec,
        |  TIMESTAMP '2024-02-29 23:59:59.123456' AS ts,
        |  array(1, 2, 3) AS arr,
        |  map('a', 1.5D, 'b', -0.5D) AS m,
        |  named_struct('x', 1L, 'y', 'z') AS st,
        |  CAST(NULL AS INT) AS nl""".stripMargin)
    df.write.mode("overwrite").parquet(s"$tmp/t")
    val back = spark.read.parquet(s"$tmp/t")
    // parquet reads all fields as nullable — compare types, not nullability
    def norm(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.map(f => f.name -> f.dataType.sql.replace(" NOT NULL", "")).toSeq
    assert(norm(back.schema) == norm(df.schema))
    val (a, b) = (df.head, back.head)
    assert(a.getDecimal(0) == b.getDecimal(0))
    assert(a.getTimestamp(1) == b.getTimestamp(1))
    assert(a.getSeq[Int](2) == b.getSeq[Int](2))
    assert(a.getMap[String, Double](3) == b.getMap[String, Double](3))
    assert(a.getStruct(4) == b.getStruct(4))
    assert(b.isNullAt(5))
  }

  test("unsigned-width and hugeint-style values map to wider signed/decimal") {
    // SURVEY §1.2: UBIGINT → DECIMAL(38,0) territory; verify big values hold
    val df = Seq(BigDecimal("18446744073709551615")).toDF("u64max")
    val cast = df.select($"u64max".cast("decimal(38,0)")).head.getDecimal(0)
    assert(cast.toString == "18446744073709551615")
  }

  test("interval arithmetic (day-time) behaves") {
    val r = spark.sql(
      "SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '1 12:30:00' DAY TO SECOND AS t")
      .head.getTimestamp(0).toString
    assert(r.startsWith("2024-01-02 12:30:00"))
  }

  test("agg_stats 2- and 3-row groups: NULL bias-corrected stats, no ANSI crash") {
    // the sample-skew denominator is n-2 and the kurtosis one (n-2)(n-3):
    // under ANSI (Spark 4 default) an unguarded division crashes on tiny
    // groups where the statistic is undefined
    val li = graft.Tables.t(spark, sf(), "lineitem")
    val flag = li.select($"l_returnflag").head.getString(0)
    for (n <- Seq(2, 3)) {
      val dir = java.nio.file.Files.createTempDirectory(s"aggstats$n").toString
      li.filter($"l_returnflag" === flag).limit(n)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val r = Aggregates.aggStats(spark, dir).collect()
      assert(r.length == 1)
      assert(r.head.isNullAt(r.head.fieldIndex("kurt_s")), s"n=$n kurt_s")
      if (n == 2) assert(r.head.isNullAt(r.head.fieldIndex("skew_s")), "n=2 skew_s")
    }
  }
}
