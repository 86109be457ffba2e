package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-4 relational-sugar surface: LATERAL, UNPIVOT, DISTINCT ON,
  * QUALIFY, and the two extra JOB-style join shapes. Each test pins the
  * semantic contract the oracle also checks, so a regression is caught
  * at suite speed without the DuckDB gate. */
class RelationalSugarSpec extends SparkSpec {

  test("EXCLUDE CURRENT ROW composition is NULL-exact (fixture has no NULLs)") {
    // DuckDB's native EXCLUDE semantics on NULLs: a NULL current value
    // must not null the neighbor sum, and an excluded frame with zero
    // non-null contributors must yield NULL, not 0. The events fixture
    // happens to be NULL-free, so the oracle can't pin this — pin it here
    // with a constructed frame. Window: rows between -1 and 1, per key.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1, 1, Some(10.0)), (1, 2, None), (1, 3, Some(30.0)), // NULL current mid-frame
      (2, 1, Some(5.0)), (2, 2, None), (2, 3, None)         // only-contributor case
    ).toDF("k", "seq", "value")
    val w = Window.partitionBy($"k").orderBy($"seq").rowsBetween(-1, 1)
    val exclNonNull = count($"value").over(w) -
      when($"value".isNotNull, 1).otherwise(0)
    val out = df.select($"k", $"seq",
        when(exclNonNull === 0, lit(null))
          .otherwise(sum($"value").over(w) - coalesce($"value", lit(0.0)))
          .as("neighbor_sum"))
      .collect().map(r => (r.getInt(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(out === Set(
      (1, 1, None),        // frame {10,NULL}, excl self → {NULL} → NULL
      (1, 2, Some(40.0)),  // NULL current, neighbors 10+30
      (1, 3, None),        // frame {NULL,30}, excl self → {NULL} → NULL
      (2, 1, None),        // frame {5,NULL}, excl self → {NULL} → NULL
      (2, 2, Some(5.0)),   // NULL current, neighbors {5,NULL} → 5
      (2, 3, None)))       // frame {NULL,NULL}, excl self → {NULL} → NULL
  }

  test("win_groups: GROUPS frames match a brute-force peer-group scan") {
    // Independent oracle for the dense_rank/RANGE equivalence: per
    // partition, number the distinct ORDER-BY values (the peer groups),
    // then recompute every GROUPS-frame aggregate by scanning rows whose
    // group index is within the bound — the SQL:2011 definition, no
    // window functions involved.
    val rows = Windows.winGroups(spark, sf()).collect()
    assert(rows.nonEmpty)
    val qtyOf = (r: org.apache.spark.sql.Row) =>
      BigDecimal.valueOf(r.getAs[Number]("l_quantity").doubleValue)
    rows.groupBy(_.getAs[String]("l_returnflag")).foreach { case (_, part) =>
      val groups = part.map(qtyOf).distinct.sorted.zipWithIndex.toMap
      part.foreach { r =>
        val g = groups(qtyOf(r))
        val in11 = part.filter(x => math.abs(groups(qtyOf(x)) - g) <= 1)
        val inU1 = part.filter(x => groups(qtyOf(x)) <= g + 1)
        val peers = part.filter(x => groups(qtyOf(x)) == g)
        assert(r.getAs[Long]("n_g11") === in11.length.toLong)
        assert(r.getAs[Double]("qty_g11") === in11.map(qtyOf).sum.toDouble)
        assert(r.getAs[Long]("n_gu1f") === inU1.length.toLong)
        val exclGrp = in11.length - peers.length
        if (exclGrp == 0) assert(r.isNullAt(r.fieldIndex("qty_excl_grp")))
        else assert(r.getAs[Double]("qty_excl_grp") ===
          (in11.map(qtyOf).sum - peers.map(qtyOf).sum).toDouble)
        assert(r.getAs[Long]("n_excl_ties") === (exclGrp + 1).toLong)
      }
    }
  }

  test("globalPosition numbers NULL keys LAST (DuckDB row_number parity)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(Some(10L), None, Some(5L), None, Some(20L)).toDF("k")
    val pos = Joins.globalPosition(df, col("k"), 2)
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), r.getLong(1)))
      .toSet
    // non-NULL keys take positions 1..3 in key order; NULLs take 4..5
    assert(pos.filter(_._1.isDefined).map(p => (p._1.get, p._2)) ===
      Set((5L, 1L), (10L, 2L), (20L, 3L)))
    assert(pos.filter(_._1.isEmpty).map(_._2) === Set(4L, 5L))
  }

  test("join_lateral equals the explicit window top-k filter") {
    val lateral = Joins.joinLateral(spark, sf())
    // independent phrasing: rank customers per nation, keep top 2
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val expected = graft.Tables.t(spark, sf(), "customer")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .join(graft.Tables.t(spark, sf(), "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"), col("c_acctbal"))
    assert(lateral.exceptAll(expected).isEmpty && expected.exceptAll(lateral).isEmpty)
  }

  test("shape_unpivot melts 4 measures: n = |lineitem| per measure") {
    val rows = Shaping.shapeUnpivot(spark, sf()).collect()
    val liCount = graft.Tables.t(spark, sf(), "lineitem").count()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[Long]("n") == liCount))
  }

  test("shape_distinct_on keeps exactly one row per customer key") {
    val df = Shaping.shapeDistinctOn(spark, sf())
    assert(df.count() == df.select("o_custkey").distinct().count())
  }

  test("win_range_interval: trailing-hour frame matches a hand fold for the busiest user") {
    import org.apache.spark.sql.functions._
    val got = Windows.winRangeInterval(spark, sf()).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_1h"), r.getAs[Long]("cents_1h"))).toMap
    val u = graft.Tables.t(spark, sf(), "events")
      .groupBy(col("user_id")).count().orderBy(col("count").desc, col("user_id"))
      .head.getLong(0)
    val rows = graft.Tables.t(spark, sf(), "events")
      .filter(col("user_id") === u)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._2)
    assert(rows.length >= 2, "busiest user must have several events")
    rows.foreach { case (id, t, _) =>
      // peers (equal ts) and the hour bound are both INCLUSIVE
      val in = rows.filter { case (_, t2, _) => t2 <= t && t2 >= t - 3600L * 1000000L }
      assert(got(id) == ((in.length.toLong, in.map(_._3).sum)),
        s"event $id trailing-hour mismatch")
    }
  }

  test("win_qualify keeps at most 3 rows per customer, ranked") {
    val perKey = Windows.winQualify(spark, sf())
      .groupBy("o_custkey").agg(count(lit(1)).as("k"), max("rn").as("maxrn"))
    assert(perKey.filter(col("k") > 3 || col("maxrn") > 3).isEmpty)
  }

  test("job_bushy branch totals are consistent: cust_rev sums to lineitem revenue") {
    // sf0.01: every nation has both customers and suppliers, so the
    // branch join drops nothing and the branch total must equal the
    // direct lineitem revenue (at sf0.001 supplier covers only 10 nations).
    val total = CoreQueries.jobBushy(spark, sf("sf0.01"))
      .agg(sum(col("cust_rev")).as("t")).collect()(0).getDouble(0)
    val direct = graft.Tables.t(spark, sf("sf0.01"), "lineitem")
      .agg(sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
        * (lit(1).cast(org.apache.spark.sql.types.DecimalType(18, 2))
          - col("l_discount").cast(org.apache.spark.sql.types.DecimalType(18, 2))))
        .cast("double")).collect()(0).getDouble(0)
    // every lineitem belongs to exactly one order->customer->nation chain
    assert(math.abs(total - direct) < 1e-6 * math.abs(direct))
  }

  test("job_chain output is bounded by nation count") {
    assert(CoreQueries.jobChain(spark, sf()).count() <= 25)
  }

  test("agg_grouping_fn: flags separate subtotal rows from data rows") {
    val rows = Aggregates.aggGroupingFn(spark, sf()).collect()
    // gid is the bitmask of the two flags; grand total has gid 3
    assert(rows.forall(r =>
      r.getAs[Long]("gid") == 2L * r.getAs[Int]("g_status") + r.getAs[Int]("g_prio")))
    assert(rows.count(_.getAs[Long]("gid") == 3L) == 1)
  }

  test("shape_pivot_dynamic discovers the status values as columns") {
    val df = Shaping.shapePivotDynamic(spark, sf())
    assert(df.columns.toSet.contains("o_orderpriority"))
    assert(df.columns.length >= 3) // priority + at least two discovered statuses
  }

  test("text_quality: keep is exactly the conjunction of the rule flags") {
    val bad = graft.pipeline.TextAnalysis.textQuality(spark, sf())
      .filter(col("keep") =!=
        (col("ok_len") && col("ok_shape") && col("ok_stop") && col("ok_sym")))
    assert(bad.isEmpty)
  }
}
