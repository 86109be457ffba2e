package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property check: the distributed blocked IEJoin equals the naive theta
  * join on arbitrary data — duplicates, negatives, skew, tiny and empty
  * sides, random op pairs — not just the deterministic spec matrix. */
class IEJoinBlockedPropertySpec extends SparkSpec {
  import spark.implicits._

  test("ieJoinBlocked == naive theta join on random inputs") {
    val row = for {
      a <- Gen.chooseNum(-50, 50)
      b <- Gen.chooseNum(-50, 50)
    } yield (a.toDouble, b.toDouble)
    val side = Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, row))
    val op = Gen.oneOf("<", "<=", ">", ">=")
    val prop = Prop.forAll(side, side, op, op) { (xs, ys, opA, opB) =>
      val x = xs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("xid", "a1", "b1")
      val y = ys.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("yid", "a2", "b2")
      val blocked = ScaleJoins.ieJoinBlocked(x, y, "a1", "a2", opA, "b1", "b2", opB, blocks = 4)
        .select($"xid", $"yid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = x.join(y, ScaleJoins.cmp($"a1", opA, $"a2") && ScaleJoins.cmp($"b1", opB, $"b2"))
        .select($"xid", $"yid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      blocked == naive
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }
}

class TpchQueriesSpec extends SparkSpec {

  test("all 18 analog shapes execute on the smallest fixture") {
    // sf0.001 is 100× below the oracle scale: most filters match few or
    // zero rows there, which is exactly where data-dependent plans break
    // (empty broadcast sides, all-null aggregates, empty quantile sets).
    // Every shape must still produce its declared schema without throwing.
    TpchQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf("sf0.001"))
      assert(df.columns.nonEmpty, name)
      assert(df.count() >= 0, name) // forces full execution
    }
  }

  test("scalar-aggregate shapes return exactly one row even when empty") {
    // q6/q14/q17/q19 are ungrouped aggregates: SQL semantics give ONE row
    // (possibly null-valued) on empty input, and the oracle compares on
    // that — a 0-row frame here would hash-mismatch.
    for (name <- Seq("q6_forecast", "q14_promo", "q17_smallqty", "q19_disjunct")) {
      assert(TpchQueries.queries(name)(spark, sf("sf0.001")).count() == 1, name)
    }
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("job_fact_fact: both joins shuffle — no broadcast survives the hints") {
    val p = plan(CoreQueries.jobFactFact(spark, sf()))
    assert(p.contains("SortMergeJoin"), "lineitem⋈orders must sort-merge")
    assert(p.contains("ShuffledHashJoin"), "⋈customer must shuffle-hash")
    assert(!p.contains("BroadcastHashJoin"),
      "a broadcast here would OOM at fact scale — the hints must hold")
  }

  test("job_long_chain: dims broadcast, exactly one large exchange regime") {
    val p = plan(CoreQueries.jobLongChain(spark, sf()))
    assert(p.contains("BroadcastHashJoin"), "reduced dims must broadcast")
    assert(!p.contains("CartesianProduct"))
    val rows = CoreQueries.jobLongChain(spark, sf()).collect()
    assert(rows.length <= 25) // at most one row per nation
  }

  test("job_cyclic: cycle edge folds into the join keys — no residual cartesian") {
    val p = plan(CoreQueries.jobCyclic(spark, sf()))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the cycle-closing c_nationkey = n_nationkey must join, not NL-filter")
    val rows = CoreQueries.jobCyclic(spark, sf()).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    // cyclic consistency: every group's nation is in EUROPE
    import org.apache.spark.sql.functions._
    val euro = graft.Tables.t(spark, sf(), "nation")
      .join(graft.Tables.t(spark, sf(), "region")
        .filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    rows.foreach(r => assert(euro.contains(r.getString(0))))
  }

  test("job_disjunctive: OR across two relations stays a residual filter over hash joins") {
    val p = plan(CoreQueries.jobDisjunctive(spark, sf()))
    assert(!p.contains("CartesianProduct"),
      "the OR predicate must not degrade the equi-joins to a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin"), "part/supplier still broadcast-hash-join")
    // the disjunction survives as a filter (it cannot push to either scan)
    assert(p.contains("p_size") && p.contains("s_acctbal"))
  }

  test("job_anti_outer: anti prunes before the outer enrichment") {
    val p = plan(CoreQueries.jobAntiOuter(spark, sf()))
    assert(p.contains("LeftAnti"), "NOT EXISTS must plan as anti join")
    val df = CoreQueries.jobAntiOuter(spark, sf())
    // no surviving customer may hold a 1998 order
    import org.apache.spark.sql.functions._
    val bad = df.join(
      graft.Tables.t(spark, sf(), "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp")),
      col("c_custkey") === col("o_custkey"), "inner").count()
    assert(bad == 0)
  }

  test("job_many_relations: 16 relations, dims broadcast, fact scanned twice, no cartesian") {
    val df = CoreQueries.jobManyRelations(spark, sf())
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the 15-edge join graph must stay hash joins throughout")
    // 16 scans in the raw plan; identical dimension branches may dedupe
    // through ReusedExchange when a sibling suite's conf (AQE) is live on
    // the shared session, so pin the range, not the exact count
    val scans = p.split("\n").count(_.trim.matches("""\(\d+\) Scan parquet.*"""))
    assert(scans >= 10 && scans <= 16,
      s"all 16 relations scan (modulo exchange reuse), got $scans")
    val bhj = p.split("BroadcastHashJoin").length - 1
    assert(bhj >= 10, s"the dimension legs must broadcast (got $bhj BHJs)")
    // the linenumber inequality rides the order-key equi-join as a
    // residual — it must not appear as a standalone post-join Filter
    assert(p.contains("l_orderkey"), "fact-fact join keeps its equi key")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the s3 cycle (s3.nation = customer's nation AND s3 = l1's supplier)
    // forces supplier geo == customer geo on every surviving row
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      "cycle-closing alias must equate the two region paths"))
  }

  test("job_like_dims: LIKE predicates push into the scans as string filters") {
    val p = plan(CoreQueries.jobLikeDims(spark, sf()))
    assert(p.contains("StringStartsWith(p_name,red)"),
      "prefix LIKE must reach the parquet scan, not a post-scan Filter")
    assert(p.contains("StringEndsWith(s_name,1)"),
      "suffix LIKE must reach the parquet scan")
    assert(p.contains("BroadcastHashJoin"), "LIKE-filtered dims must broadcast")
  }

  test("job_like_disjunct: OR/NOT of contains-LIKEs pushes as one composite filter") {
    val p = plan(CoreQueries.jobLikeDisjunct(spark, sf()))
    assert(p.contains("Or(StringContains(p_name,gear),StringContains(p_name,bolt))"),
      "the LIKE disjunction must push down as a composed Or filter")
    assert(p.contains("Not(StringContains(p_name,small))"),
      "NOT LIKE must push down")
  }

  test("job_min_join: ungrouped min runs partial map-side, one row per task to the final") {
    val p = plan(CoreQueries.jobMinJoin(spark, sf()))
    assert(p.contains("StringContains(p_name,widget)"), "contains-LIKE pushes")
    // string-typed min/max is not hash-aggregable in Spark, so the
    // partial/final pair plans as SortAggregate — pin the PAIR, not the
    // node flavor (the point is map-side partial min, one row per task)
    assert("(Sort|Hash)Aggregate".r.findAllMatchIn(p).length >= 2,
      "partial + final aggregate pair expected (map-side partial min)")
  }

  test("job_alias_reuse: each alias's filter prunes ITS OWN scan") {
    val p = plan(CoreQueries.jobAliasReuse(spark, sf()))
    // two lineitem scans, each carrying only its alias's pushed filter —
    // a shared unfiltered scan post-filtered twice would read the fact
    // columns of BOTH aliases everywhere
    val pushed = p.split("\n").filter(_.contains("PushedFilters"))
    val retScans = pushed.count(l =>
      l.contains("EqualTo(l_returnflag,R)") && !l.contains("l_quantity"))
    val qtyScans = pushed.count(l =>
      l.contains("GreaterThan(l_quantity,45") && !l.contains("l_returnflag"))
    assert(retScans == 1, s"alias 1 scan must push only the returnflag gate ($pushed)")
    assert(qtyScans == 1, "alias 2 scan must push only the quantity gate")
  }

  test("job_in_dims: IN-list filters push into the dim scans, dims broadcast") {
    val p = plan(CoreQueries.jobInDims(spark, sf()))
    assert(p.contains("In(p_brand"),
      "the brand IN-list must reach the parquet scan as an In filter")
    assert(p.contains("In(c_mktsegment"),
      "the segment IN-list must reach the parquet scan")
    val bhj = p.split("BroadcastHashJoin").length - 1
    assert(bhj >= 2, s"both IN-filtered dims must broadcast (got $bhj)")
  }
}
