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

  private def topk(df: org.apache.spark.sql.DataFrame, cap: Int, k: Int) =
    df.agg(G.approx_top_k($"v", cap, k).as("hh"))
      .select(org.apache.spark.sql.functions.explode($"hh").as("h"))
      .select($"h.value", $"h.count_est", $"h.max_err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("approx_top_k is exact (zero error) when distincts fit capacity") {
    val df = spark.range(0, 1000, 1, 8)
      .select(($"id" % 7).cast("string").as("v"))
    val hh = topk(df, cap = 16, k = 7)
    assert(hh.length == 7)
    assert(hh.forall(_._3 == 0L), s"no eviction → all errors zero: ${hh.toSeq}")
    // ids 0..999 % 7: 143 each for 0..5 (plus 1 extra for 0..5? compute exactly)
    val exact = (0L until 1000L).groupBy(_ % 7).view.mapValues(_.size.toLong).toMap
    hh.foreach { case (v, c, _) => assert(c == exact(v.toLong), s"$v: $c") }
  }

  test("approx_top_k under eviction: bound holds, heavy hitter survives") {
    // skewed stream: "hot" 500×, 100 singletons — capacity 8 forces
    // eviction; the Space-Saving guarantees to check:
    //   true ≤ count_est ≤ true + max_err   (overestimate, bounded error)
    //   any value with freq > N/capacity is tracked  (hot: 500 > 600/8)
    val rows = (Seq.fill(500)("hot") ++ (0 until 100).map(i => s"cold$i"))
    val df = spark.sparkContext.parallelize(rows, 4).toDF("v")
    val hh = topk(df, cap = 8, k = 8)
    val hot = hh.find(_._1 == "hot")
    assert(hot.isDefined, s"frequency-500 value must be tracked: ${hh.toSeq}")
    val (_, c, e) = hot.get
    assert(c >= 500L, s"space-saving never underestimates: $c")
    assert(c - e <= 500L, s"true count must lie in [est-err, est]: est=$c err=$e")
    assert(hh.length <= 8)
  }

  test("hll sketch union is lossless: merged pre-aggregates equal the direct sketch") {
    // the 100 TB pre-aggregation pattern: per-(type, day) sketches rolled
    // up must estimate EXACTLY what one pass over raw data estimates —
    // HLL union at a fixed lgK is the sketch of the union, not an
    // approximation of an approximation
    val ev = graft.Tables.t(spark, sf(), "events")
    val daily = ev.groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
    val merged = daily.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.nonEmpty && merged == direct)
    // and the entry's contract column holds on the fixture
    val rows = graft.operators.Aggregates.aggHllMerge(spark, sf()).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Boolean]("est_within_5pct")))
  }

  test("kahan_sum recovers catastrophic cancellation a naive double fold loses") {
    // 1e16 + 1.0 - 1e16: naive left-to-right double addition drops the 1.0
    // (1e16 + 1.0 == 1e16 in binary64); compensated summation keeps it
    val vals = Seq(1e16, 1.0, -1e16)
    assert(vals.reduceLeft(_ + _) == 0.0, "premise: naive fold loses the 1.0")
    val got = vals.toDF("v").agg(G.kahan_sum($"v")).head.getDouble(0)
    assert(got == 1.0, s"kahan_sum returned $got")
  }

  test("kahan_sum equals the BigDecimal ground truth under adversarial partitioning") {
    // 10k small adds onto a 1e12 base: each naive step rounds at
    // ulp(1e12) ≈ 1.2e-4, accumulating visible drift; the compensation
    // captures exactly those lost low bits, across any partition layout
    val vals = Seq(1e12) ++ Seq.fill(10000)(0.1) ++ Seq(-1e12)
    val truth = vals.map(BigDecimal.exact).sum.toDouble
    for (parts <- Seq(1, 7, 32)) {
      val got = spark.sparkContext.parallelize(vals, parts).toDF("v")
        .agg(G.kahan_sum($"v")).head.getDouble(0)
      assert(math.abs(got - truth) <= 1e-9, s"parts=$parts: $got vs $truth")
    }
    // and the single-stream naive double sum is measurably worse
    val naive = vals.reduceLeft(_ + _)
    assert(math.abs(naive - truth) > 1e-6,
      s"premise: naive fold should drift on this data ($naive vs $truth)")
  }

  test("reservoir_quantile is EXACT when the group fits capacity (merge = concat)") {
    // 1000 rows over 8 partitions, capacity 2048 → no eviction anywhere;
    // result must equal quantile_disc's ceil(q·n) element exactly
    val df = spark.range(0, 1000, 1, 8).select(($"id" + 1).cast("double").as("v"))
    for ((q, want) <- Seq(0.25 -> 250.0, 0.5 -> 500.0, 0.75 -> 750.0)) {
      val got = df.agg(G.reservoir_quantile($"v", q, capacity = 2048))
        .head.getDouble(0)
      assert(got == want, s"q=$q: $got != $want")
    }
  }

  test("reservoir_quantile under eviction: bounded error on a uniform stream") {
    // 20k uniform values, capacity 512 → heavy eviction; the sampled
    // median of a uniform 1..20000 stream concentrates near 10000
    // (binomial tail: P(|p̂-0.5| > 0.15) at m=512 is ~1e-11)
    val df = spark.range(0, 20000, 1, 16).select(($"id" + 1).cast("double").as("v"))
    val got = df.agg(G.reservoir_quantile($"v", 0.5, capacity = 512))
      .head.getDouble(0)
    assert(math.abs(got - 10000.0) < 3000.0, s"sampled median wildly off: $got")
  }

  test("reservoir_quantile skips NULLs and returns NULL on an all-NULL group") {
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("b", None))
      .toDF("k", "v")
    val rows = df.groupBy($"k").agg(G.reservoir_quantile($"v", 0.5).as("m"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(rows("a") == Some(1.0), s"median of {1,3} at ceil(0.5·2)=1st: ${rows("a")}")
    assert(rows("b").isEmpty, "all-NULL group → NULL")
  }

  test("bloom: OR-merge is idempotent/commutative; bitmap partition-invariant") {
    val agg = new graft.functions.GraftAggregators.BloomAggregator(256)
    val a = agg.reduce(agg.reduce(agg.zero, 5L), 5L)     // duplicate delivery
    val b = agg.reduce(agg.zero, 5L)
    assert(a.toSeq == b.toSeq, "setting a bit twice is setting it once")
    val m1 = agg.merge(agg.reduce(agg.zero, 7L), agg.reduce(agg.zero, 200L))
    val m2 = agg.merge(agg.reduce(agg.zero, 200L), agg.reduce(agg.zero, 7L))
    assert(m1.toSeq == m2.toSeq, "merge commutes")
    assert(m1.map(java.lang.Long.bitCount).sum == 2)
    // bit 63 of a word: the position that exposed the arithmetic-shift
    // trap in the lookup (shiftright keeps the sign; & 1 must still read 1)
    val hi = agg.reduce(agg.zero, 63L)
    assert((hi(0) >>> 63) == 1L)
  }

  test("count-min: counter merge is a commutative monoid; estimates never underestimate") {
    val agg = new graft.functions.GraftAggregators.CountMinAggregator(2, 8)
    val a = agg.reduce(agg.reduce(agg.zero, 3L), 3L)
    assert(a(3) == 2L, "same position increments accumulate")
    val m1 = agg.merge(agg.reduce(agg.zero, 1L), agg.reduce(agg.zero, 9L))
    val m2 = agg.merge(agg.reduce(agg.zero, 9L), agg.reduce(agg.zero, 1L))
    assert(m1.toSeq == m2.toSeq && m1.sum == 2L)
    val out = graft.operators.Aggregates.aggCms(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 10)
    out.foreach { case (k, t, e, nu) =>
      assert(nu && e >= t, s"CMS underestimated key $k: $e < $t") }
    // present keys carry their true mass at minimum
    assert(out.filter(_._2 > 0).forall(r => r._3 >= r._2))
  }

  test("agg_bloom: a Bloom filter has NO false negatives, under any partitioning") {
    val out = graft.operators.Aggregates.aggBloom(spark, sf())
    val rows = out.collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows.length == 20)
    rows.filter(_._2).foreach { case (k, _, hit) =>
      assert(hit, s"present key $k missed — impossible for a Bloom filter") }
    val again = graft.operators.Aggregates.aggBloom(spark, sf())
      .repartition(5).collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(again.toSet == rows.toSet, "bitmap and lookups are exact integers")
  }
}
