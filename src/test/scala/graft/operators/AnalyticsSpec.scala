package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic + plan pins for the product-analytics tranche (rolling
  * DAU/WAU, Markov paths, inter-arrival, anomaly scan, gap-fill, A/B
  * readout, RFM). Each test recomputes the entry's core invariant from
  * the raw fixture rather than trusting the entry's own arithmetic. */
class AnalyticsSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("events_wau: dau matches per-day distinct, wau >= dau, day dim broadcast") {
    val rows = OlapSuites.eventsWau(spark, sf()).collect()
    assert(rows.nonEmpty)
    val dauByDay = graft.Tables.t(spark, sf(), "events")
      .select(col("ts").cast("date").as("d"), col("user_id")).distinct()
      .groupBy(col("d")).agg(count(lit(1)).as("dau"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (d, dau, wau) = (r.getDate(0).toString, r.getLong(1), r.getLong(2))
      assert(dau == dauByDay(d), s"dau mismatch on $d")
      assert(wau >= dau && r.getDouble(3) <= 1.0)
    }
    assert(plan(OlapSuites.eventsWau(spark, sf())).contains("Broadcast"),
      "the calendar-bounded day dimension must broadcast")
  }

  test("events_scd2: versions dense, intervals abut, states compressed, one current per user") {
    val rows = BizAnalytics.eventsScd2(spark, sf()).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    // every active user gets a history whose version 1 opens it
    val activeUsers = graft.Tables.t(spark, sf(), "events")
      .select(col("user_id")).distinct().count()
    assert(byUser.size.toLong == activeUsers)
    byUser.values.foreach { h =>
      val sorted = h.sortBy(_.getAs[Int]("version"))
      assert(sorted.map(_.getAs[Int]("version")).toSeq == (1 to h.length),
        "versions are 1..k dense")
      // consecutive versions change state and abut exactly
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("state") != b.getAs[String]("state"),
            "SCD2 must compress same-state runs")
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
            b.getAs[java.sql.Timestamp]("valid_from"), "intervals must abut")
        case _ =>
      }
      // exactly the last version is current (open-ended)
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1)
      assert(sorted.last.getAs[Boolean]("is_current") &&
        sorted.last.getAs[java.sql.Timestamp]("valid_to") == null)
    }
    // one exchange: all three windows share the user_id partitioning
    // (formatted mode repeats each op in the details list — count the
    // partitioning argument, the tsEwma precedent)
    val p = plan(BizAnalytics.eventsScd2(spark, sf()))
    assert(p.linesIterator.count(_.contains("hashpartitioning(user_id")) == 1,
      s"change-detect, version, and valid_to must ride ONE user_id shuffle:\n$p")
  }

  test("events_paths: outgoing probabilities sum to 1 per prev state") {
    val rows = OlapSuites.eventsPaths(spark, sf()).collect()
    val byPrev = rows.groupBy(_.getString(0))
    byPrev.foreach { case (prev, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 0.01, s"P(.|$prev) sums to $pSum")
    }
    // total transitions = events - one first-event per active user
    val ev = graft.Tables.t(spark, sf(), "events")
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("events_interarrival: gap count is events minus per-(user,type) firsts") {
    val rows = OlapSuites.eventsInterarrival(spark, sf()).collect()
    val ev = graft.Tables.t(spark, sf(), "events")
    val expected = ev.groupBy(col("event_type"))
      .agg((count(lit(1)) - countDistinct(col("user_id"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == expected(r.getString(0)))
      assert(r.getDouble(2) >= 0 && r.getDouble(4) >= r.getDouble(3),
        "max >= median >= 0")
    }
  }

  test("events_anomaly: grid is types x days and the flag mirrors |z| >= 2") {
    val df = OlapSuites.eventsAnomaly(spark, sf())
    val rows = df.collect()
    val ev = graft.Tables.t(spark, sf(), "events")
      .select(col("event_type"), col("ts").cast("date").as("d"))
    val expected = ev.distinct().count()
    assert(rows.length == expected)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getBoolean(4) == (math.abs(r.getDouble(3)) >= 2.0))
    }
  }

  test("ts_gapfill: dense grid, fill carries the last observation, gap age is exact") {
    val rows = OlapSuites.tsGapfill(spark, sf()).collect()
    val types = rows.map(_.getString(0)).distinct.length
    val days = rows.map(_.getDate(1).toString).distinct.length
    assert(rows.length == types * days, "grid must be dense")
    val obs = rows.filter(!_.isNullAt(2))
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    rows.filter(!_.isNullAt(5)).foreach { r =>
      val lastD = r.getDate(4).toString
      assert(r.getLong(3) == obs((r.getString(0), lastD)),
        "c_fill must equal the observation at last_obs_d")
      if (!r.isNullAt(2)) assert(r.getLong(5) == 0L, "observed rows have age 0")
    }
    // rows before a type's first observation stay NULL (no fabricated zero)
    assert(rows.forall(r => !r.isNullAt(3) || r.isNullAt(2)))
  }

  test("events_ab_assign: arms partition the users and z recomputes") {
    val r = OlapSuites.eventsAbAssign(spark, sf()).collect().head
    val users = graft.Tables.t(spark, sf(), "events")
      .select(col("user_id")).distinct().count()
    val (na, ka, nb, kb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(na + nb == users && ka <= na && kb <= nb)
    val (p1, p2) = (ka.toDouble / na, kb.toDouble / nb)
    val p = (ka + kb).toDouble / (na + nb)
    val se = math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    if (se > 0) assert(math.abs(r.getDouble(6) -
      BigDecimal((p1 - p2) / se).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
  }

  test("ts_ewma: hand-computed taps, head renormalization, integer truncation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ewma").toString
    // one user, values 1.00 then 2.00 one second apart
    Seq((1L, 1L, 1.00), (2L, 2L, 2.00)).toDF("event_id", "tsn", "value")
      .select(col("event_id"), timestamp_seconds(col("tsn")).as("ts"),
        lit(7L).as("user_id"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = BizAnalytics.tsEwma(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("ewma_cents")).toMap
    // row 1: only tap0 present → 100·128/128 = 100
    assert(got(1L) == 100L)
    // row 2: (200·128 + 100·64) / (128+64) = 32000/192 = 166.67 → 166
    assert(got(2L) == 166L)
  }

  test("ts_ewma on the fixture: one window pass, bounded by the tap extremes") {
    val df = BizAnalytics.tsEwma(spark, sf())
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // all 8 lags share one frame → exactly one Window node ("(n) Window"
    // in formatted mode)
    assert(plan.linesIterator.count(_.matches(""".*\(\d+\) Window\s*""")) == 1)
    // formatted mode puts the Exchange's partitioning on its Arguments
    // line; exactly one hashpartitioning(user_id…) may appear anywhere
    assert(plan.linesIterator.count(_.contains("hashpartitioning(user_id")) == 1,
      "the 8 taps must ride ONE user_id shuffle")
    // EWMA is a convex combination of the taps → lies within the running
    // min/max of the last 8 values per user; spot-check global bounds
    val stats = graft.Tables.t(spark, sf(), "events")
      .agg(min(round(col("value") * 100)).as("mn"),
        max(round(col("value") * 100)).as("mx")).head
    val (mn, mx) = (stats.getDouble(0).toLong, stats.getDouble(1).toLong)
    val out = df.agg(min(col("ewma_cents")), max(col("ewma_cents"))).head
    assert(out.getLong(0) >= mn - 1 && out.getLong(1) <= mx)
  }

  test("cust_rfm: segments partition the customers and quintiles are balanced") {
    val rows = OlapSuites.custRfm(spark, sf()).collect()
    val nCust = graft.Tables.t(spark, sf(), "orders")
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getLong(3)).sum == nCust)
    (0 to 2).foreach { i =>
      val marginal = rows.groupBy(_.getInt(i)).view
        .mapValues(_.map(_.getLong(3)).sum).toMap
      assert(marginal.keySet.subsetOf((1 to 5).toSet))
      // ntile balance: bucket sizes differ by at most 1
      assert(marginal.values.max - marginal.values.min <= 1,
        s"score column $i must be quintile-balanced: $marginal")
    }
  }

  test("ts_holt tracks a perfect linear series exactly and matches the exact-fraction fold") {
    import spark.implicits._
    // user 1: y_t = 100 + 7t cents — Holt with b1 = y2-y1 locks onto a
    // line exactly, so the one-step forecast IS the next point
    val line = (1 to 8).map(t =>
      (t.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:0$t%02d:00"),
        1L, "view", (100 + 7 * t) / 100.0, ""))
    // user 2: an arbitrary series, checked against a BigInt re-derivation
    val ys = Seq(120L, -35L, 260L, 88L, 97L, 310L, 150L, 205L)
    val arb = ys.zipWithIndex.map { case (c, i) =>
      ((i + 10).toLong, java.sql.Timestamp.valueOf(f"2024-01-01 01:0${i + 1}%02d:00"),
        2L, "view", c / 100.0, "")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_holt_").toString
    (line ++ arb).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val got = BizAnalytics.tsHolt(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L)._3 == 100 + 7 * 9, s"linear series forecast must be y9: ${got(1L)}")
    // driver-side re-derivation of the integer recursion
    var L = BigInt(8) * ys.head
    var B = BigInt(8) * (ys(1) - ys.head)
    var s8 = BigInt(8)
    for (t <- 2 to 8) {
      val (lp, bp) = (L, B)
      L = 4 * (s8 * ys(t - 1) + lp + bp)
      B = s8 * ys(t - 1) - lp + 7 * bp
      s8 *= 8
    }
    assert(got(2L) == ((L.toLong, B.toLong, ((L + B) / BigInt(16777216)).toLong)),
      s"integer fold mismatch: ${got(2L)} vs ($L, $B)")
  }
}
