package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan pins + constructed-graph semantics for the Train Benchmark /
  * LDBC BI analogs. The fixture results at sf0.001 can be thin (a
  * five-hop same-sensor chain is rare), so the semantic checks run on a
  * constructed corpus where the expected matches are known by hand. */
class GraphShapesSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("tb_connected_chain: five-hop chains come from consecutive same-user same-type runs") {
    import spark.implicits._
    // user 1: seven events all 'click' -> runs of 6 consecutive nodes = 2
    //   (events 10..15 and 11..16)
    // user 2: six events, one 'view' in the middle -> 0 chains
    val rows = (10L to 16L).map(id => (id, id, 1L, "click")) ++
      Seq((20L, 20L, 2L, "click"), (21L, 21L, 2L, "click"),
        (22L, 22L, 2L, "click"), (23L, 23L, 2L, "view"),
        (24L, 24L, 2L, "click"), (25L, 25L, 2L, "click"))
    val dir = java.nio.file.Files.createTempDirectory("graphshapes").toString
    rows.toDF("event_id", "tsn", "user_id", "event_type")
      .select(col("event_id"), timestamp_seconds(col("tsn")).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = GraphShapes.tbConnectedChain(spark, dir)
      .orderBy("seg1").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("seg1") == 10L && out(0).getAs[Long]("seg6") == 15L)
    assert(out(1).getAs[Long]("seg1") == 11L && out(1).getAs[Long]("seg6") == 16L)
    assert(out.forall(_.getAs[String]("sensor") == "click"))
  }

  test("graph_pagerank: symmetric 3-cycle converges to the exact uniform integer rank") {
    import spark.implicits._
    // orders rows wiring the triangle {1,2,3}: raw edges (custkey,
    // orderkey%300) = (1,2), (2,3), (3,1) → symmetric 3-cycle, all
    // degrees 2 → the integer kernel holds every node at
    // 10¹²DIV3 − 1 = 333333333332 from iteration 1 onward (one unit of
    // truncation loss in 85·Σ DIV 100).
    val dir = java.nio.file.Files.createTempDirectory("pagerank").toString
    Seq((302L, 1L), (603L, 2L), (301L, 3L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = GraphShapes.graphPagerank(spark, dir).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_e12")).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.forall(_ == 333333333332L), s"uniform rank: $got")
  }

  test("graph_pagerank on the fixture: mass conserved within truncation loss, ranks positive") {
    val rows = GraphShapes.graphPagerank(spark, sf()).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("rank_e12")).sum
    // every DIV truncates at most 1 unit per node per term; total mass
    // stays within 0.1% of 10¹²
    assert(total <= 1000000000000L && total > 999000000000L,
      s"mass conservation: $total")
    assert(rows.forall(_.getAs[Long]("rank_e12") > 0L))
  }

  test("tb_connected_chain plan: self-join chain stays equi-join, no cartesian") {
    val df = GraphShapes.tbConnectedChain(spark, sf())
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), "every hop is an equi-join")
    assert(!p.contains("BroadcastNestedLoop"))
    // five chain hops + six sensor probes (the optimizer may fold one
    // probe into an existing hop exchange — ten is the observed floor)
    val joins = p.split("\n").count(l =>
      l.contains("Join") && l.trim.startsWith("("))
    assert(joins >= 10, s"expected the deep join pattern, saw $joins")
  }

  test("tb_route_validation: anti-join keeps only non-required sensors") {
    // every order whose line's supplier nation differs from the
    // customer's nation is a violation; cross-check one nation's count
    // against a direct != computation
    val df = GraphShapes.tbRouteValidation(spark, sf())
    val viaAnti = df.agg(sum("violations")).collect()(0).getLong(0)
    val direct = graft.Tables.t(spark, sf(), "orders")
      .join(graft.Tables.t(spark, sf(), "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .join(graft.Tables.t(spark, sf(), "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.Tables.t(spark, sf(), "customer"),
        col("o_custkey") === col("c_custkey"))
      .where(col("s_nationkey") =!= col("c_nationkey"))
      .count()
    assert(viaAnti == direct,
      s"anti-join violations $viaAnti != direct mismatch count $direct")
  }

  test("tb_route_validation plan: left anti join present") {
    val p = plan(GraphShapes.tbRouteValidation(spark, sf()))
    assert(p.contains("LeftAnti"), "the validation must plan as LEFT ANTI")
  }

  test("tb_switch_mismatch: filters push into scans, mismatch holds on every row") {
    val df = GraphShapes.tbSwitchMismatch(spark, sf())
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)")
      || p.contains("EqualTo(o_orderstatus,O)"), "active filter reaches the orders scan")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), "signal filter reaches the customer scan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Number]("position").longValue !=
        r.getAs[Number]("current_position").longValue))
  }

  test("ldbc_summary_pct: shares sum to 1 and counts sum to the corpus") {
    val df = GraphShapes.ldbcSummaryPct(spark, sf())
    val agg = df.agg(sum("n").as("n"), sum("pct").as("p")).collect()(0)
    val total = graft.Tables.t(spark, sf(), "events").count()
    assert(agg.getAs[Long]("n") == total)
    val p = agg.getAs[Number]("p").doubleValue
    assert(math.abs(p - 1.0) < 1e-3, s"pct column must partition the corpus, got $p")
  }

  test("ldbc_shortest_path: hop 0 is the start node alone, hops are contiguous") {
    val rows = GraphShapes.ldbcShortestPath(spark, sf())
      .orderBy("hop").collect()
    assert(rows.head.getAs[Int]("hop") == 0 && rows.head.getAs[Long]("n_nodes") == 1L,
      "exactly one node at distance 0")
    val hops = rows.map(_.getAs[Int]("hop").toLong)
    assert(hops.sameElements(hops.indices.map(_.toLong)), "hop levels are contiguous")
    // shortest-path counts never exceed the khop reachable-set counts
    val khop = SetOps.cteKhopGraph(spark, sf()).collect()
      .map(r => r.getAs[Int]("d") -> r.getAs[Long]("n_nodes")).toMap
    rows.foreach { r =>
      val h = r.getAs[Int]("hop")
      assert(r.getAs[Long]("n_nodes") <= khop.getOrElse(h, Long.MaxValue),
        s"min-hop count at $h cannot exceed the level-$h reachable set")
    }
  }
}
