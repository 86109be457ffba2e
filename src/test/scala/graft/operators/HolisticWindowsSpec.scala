package graft.operators

import graft.SparkSpec

/** Brute-force cross-checks for the holistic window frames: each entry's
  * per-row result is recomputed in plain Scala from the same base slice
  * (partition → sort → sliding frame → quantile/mad/mode), so a frame
  * off-by-one or interpolation slip cannot hide behind the oracle using
  * the same wrong spelling. */
class HolisticWindowsSpec extends SparkSpec {

  /** (pk, okey, x) rows grouped and sorted the way the window sees them. */
  private lazy val parts: Map[Long, Vector[(Long, Int)]] = {
    import org.apache.spark.sql.functions._
    graft.Tables.t(spark, sf(), "orders")
      .filter(col("o_custkey") < 200)
      .select((col("o_custkey") % 4).as("pk"), col("o_orderkey"),
        floor(col("o_totalprice")).cast("int").as("x"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(_._2).map(t => (t._2, t._3)).toVector)
      .toMap
  }

  private def interpMedian(v: Seq[Double]): Double = {
    val s = v.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private def frame(part: Vector[(Long, Int)], i: Int, pre: Int, fol: Int) =
    part.slice(math.max(0, i - pre), math.min(part.length, i + fol + 1))

  test("win_median_frame matches a plain-Scala sliding median/quartiles") {
    val got = HolisticWindows.winMedianFrame(spark, sf()).collect()
      .map(r => (r.getLong(1), (r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    def q(v: Seq[Int], p: Double): Double = {
      val s = v.sorted
      val idx = p * (s.length - 1)
      val lo = idx.toInt
      val g = idx - lo
      if (lo + 1 < s.length) s(lo) + g * (s(lo + 1) - s(lo)) else s(lo).toDouble
    }
    var checked = 0
    for ((_, part) <- parts; i <- part.indices) {
      val f = frame(part, i, 100, 0).map(_._2)
      val (med, q25, q75) = got(part(i)._1)
      assert(med == q(f, 0.5), s"median at ${part(i)._1}")
      assert(q25 == q(f, 0.25) && q75 == q(f, 0.75), s"quartiles at ${part(i)._1}")
      checked += 1
    }
    assert(checked > 100)
  }

  test("win_mad_frame matches a plain-Scala mad (median of |x - median|)") {
    val got = HolisticWindows.winMadFrame(spark, sf()).collect()
      .map(r => (r.getLong(1), r.getDouble(3))).toMap
    for ((_, part) <- parts; i <- part.indices) {
      val f = frame(part, i, 10, 0).map(_._2.toDouble)
      val med = interpMedian(f)
      val want = interpMedian(f.map(v => math.abs(v - med)))
      assert(got(part(i)._1) == want, s"mad at ${part(i)._1}")
    }
  }

  test("win_mode_frame: lowest value wins frequency ties") {
    val got = HolisticWindows.winModeFrame(spark, sf()).collect()
      .map(r => (r.getLong(1), (r.getInt(2), r.getLong(3)))).toMap
    var ties = 0
    for ((_, part) <- parts; i <- part.indices) {
      val f = frame(part, i, 20, 0).map(_._2 % 100)
      val counts = f.groupBy(identity).view.mapValues(_.size).toMap
      val maxC = counts.values.max
      val atMax = counts.filter(_._2 == maxC).keys
      if (atMax.size > 1) ties += 1
      assert(got(part(i)._1) == ((atMax.min, maxC.toLong)), s"mode at ${part(i)._1}")
    }
    assert(ties > 0, "fixture never exercised a frequency tie — weaken x % 100")
  }

  test("win_variable_frame: per-row bounds clamp at partition edges") {
    val got = HolisticWindows.winVariableFrame(spark, sf()).collect()
      .map(r => (r.getLong(1), (r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    for ((_, part) <- parts; i <- part.indices) {
      val okey = part(i)._1
      val f = frame(part, i, (okey % 7).toInt, (okey % 3).toInt).map(_._2)
      val want = (f.size.toLong, interpMedian(f.map(_.toDouble)), f.map(_.toLong).sum)
      assert(got(okey) == want, s"variable frame at $okey")
    }
  }

  test("fixed-frame plans stay single-exchange (window shuffle only, no join)") {
    for (df <- Seq(HolisticWindows.winMedianFrame(spark, sf()),
        HolisticWindows.winMadFrame(spark, sf()),
        HolisticWindows.winModeFrame(spark, sf()),
        HolisticWindows.winListFrame(spark, sf()))) {
      val p = df.queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(p).length == 1, s"one window shuffle expected:\n$p")
      assert(!p.contains("Join"), s"no join in a fixed-frame window plan:\n$p")
    }
  }
}
