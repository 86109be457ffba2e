package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** TPC-DS-style planner shapes (reference runs the 99-query TPC-DS suite
  * as a first-class benchmark: the 99 `.benchmark` files under
  * `benchmark/tpcds/sf1/`, driven by `benchmark/run_bench.py`). These are the planner-distinct stress
  * shapes a reporting workload hits weekly, adapted to the fixture
  * schema — the POINT is the plan shape (rollup feeding a window, one
  * CTE with two aggregation consumers, two fact scans star-joined,
  * heterogeneous channel union, per-category average band filter), not
  * the TPC-DS column lists.
  *
  * Money stays DECIMAL(18,2) until the final cast to DOUBLE (oracle
  * parity: exact under any partitioning/order); month keys are cast to
  * DATE on both sides (Spark date_trunc yields TIMESTAMP, DuckDB DATE).
  */
object TpcdsShapes {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** q67-shape: ROLLUP aggregate feeding a ranking window over the SAME
    * aggregated scan (TPC-DS q67 ranks rollup'd store_sales per
    * category), filtered by rank — one scan, one shuffle for the rollup,
    * one for the window partition. */
  def dsWindowRollup(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables.t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
    val w = Window.partitionBy(col("rf"))
      .orderBy(col("sum_qty").desc_nulls_last, col("ls").asc_nulls_first)
    agg.withColumn("rk", rank().over(w)).filter(col("rk") <= 2)
  }

  val dsWindowRollupSql: String =
    """WITH agg AS (
      |  SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |         count(*) AS n
      |  FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus))
      |SELECT rf, ls, sum_qty, n, rk FROM (
      |  SELECT *, rank() OVER (PARTITION BY rf
      |    ORDER BY sum_qty DESC NULLS LAST, ls ASC NULLS FIRST) AS rk
      |  FROM agg) t
      |WHERE rk <= 2""".stripMargin

  /** q95-shape: ONE CTE consumed by TWO aggregations whose results join
    * back together (TPC-DS q95 reuses ws_wh twice). In the DataFrame API
    * the shared subplan is a val used twice; Catalyst may re-execute the
    * scan per consumer — acceptable because the CTE is a pure projection
    * (re-scan beats materialize at scale; Spark's ReuseExchange dedups
    * the shuffle if the consumers' partitioning matches). */
  def dsCteReuse(s: SparkSession, dir: String): DataFrame = {
    val mo = Tables.t(s, dir, "orders").select(
      to_date(date_trunc("month", col("o_orderdate"))).as("month"),
      col("o_custkey"), col("o_totalprice"))
    val a = mo.groupBy(col("month")).agg(
      count(lit(1)).as("n_orders"),
      sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
    val b = mo.groupBy(col("month"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"))
    a.join(b, Seq("month"))
  }

  val dsCteReuseSql: String =
    """WITH mo AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |         o_custkey, o_totalprice FROM orders)
      |SELECT a.month AS month, a.n_orders, a.revenue, b.n_cust
      |FROM (SELECT month, count(*) AS n_orders,
      |        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |      FROM mo GROUP BY month) a
      |JOIN (SELECT month, count(DISTINCT o_custkey) AS n_cust
      |      FROM mo GROUP BY month) b USING (month)""".stripMargin

  /** q64-shape: TWO fact scans (sales vs returns slices of lineitem)
    * joined on a composite key, then star-joined to broadcast dims (part,
    * supplier). The fact⋈fact join shuffles both sides on
    * (partkey, suppkey); the dims broadcast — the one big exchange a
    * two-fact star needs at any scale. */
  def dsTwoFact(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
    val sales = li.filter(col("l_returnflag") =!= "R").select(
      col("l_orderkey").as("s_ok"), col("l_partkey").as("s_pk"),
      col("l_suppkey").as("s_sk"), col("l_extendedprice").as("s_price"))
    val rets = li.filter(col("l_returnflag") === "R").select(
      col("l_orderkey").as("r_ok"), col("l_partkey").as("r_pk"),
      col("l_suppkey").as("r_sk"), col("l_extendedprice").as("r_price"))
    sales.join(rets,
        col("s_pk") === col("r_pk") && col("s_sk") === col("r_sk") &&
          col("s_ok") < col("r_ok"))
      .join(broadcast(Tables.t(s, dir, "part")), col("s_pk") === col("p_partkey"))
      .join(broadcast(Tables.t(s, dir, "supplier")), col("s_sk") === col("s_suppkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("s_price")) - dec(col("r_price"))).cast("double").as("price_delta"))
  }

  val dsTwoFactSql: String =
    """SELECT p_brand, count(*) AS n_pairs,
      |  CAST(sum(CAST(s.l_extendedprice AS DECIMAL(18,2)) - CAST(r.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_delta
      |FROM lineitem s
      |JOIN lineitem r ON s.l_partkey = r.l_partkey AND s.l_suppkey = r.l_suppkey
      |  AND s.l_orderkey < r.l_orderkey
      |JOIN part ON s.l_partkey = p_partkey
      |JOIN supplier ON s.l_suppkey = s_suppkey
      |WHERE r.l_returnflag = 'R' AND s.l_returnflag <> 'R'
      |GROUP BY p_brand""".stripMargin

  /** q71-shape: heterogeneous channel facts (orders = store, purchase
    * events = web) unioned under a common (channel, month, amount)
    * projection, then aggregated — the multi-channel union every TPC-DS
    * reporting query family (q5, q71, q77) is built on. Each branch's
    * filter/projection pushes to its own scan before the union. */
  def dsChannelUnion(s: SparkSession, dir: String): DataFrame = {
    val store = Tables.t(s, dir, "orders").select(
      lit("store").as("channel"),
      to_date(date_trunc("month", col("o_orderdate"))).as("month"),
      col("o_totalprice").as("amount"))
    val web = Tables.t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(lit("web").as("channel"),
        to_date(date_trunc("month", col("ts"))).as("month"),
        col("value").as("amount"))
    store.unionByName(web)
      .groupBy(col("channel"), col("month"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("amount"))).cast("double").as("total"))
  }

  val dsChannelUnionSql: String =
    """WITH chan AS (
      |  SELECT 'store' AS channel,
      |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |         o_totalprice AS amount FROM orders
      |  UNION ALL
      |  SELECT 'web' AS channel, CAST(date_trunc('month', ts) AS DATE) AS month,
      |         value AS amount FROM events WHERE event_type = 'purchase')
      |SELECT channel, month, count(*) AS n,
      |  CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM chan GROUP BY channel, month""".stripMargin

  /** q6-shape: keep fact rows priced above 1.3× their category average
    * (TPC-DS q6's correlated average-price subquery). The correlated
    * scalar subquery decorrelates to a category window over the joined
    * scan; the band test is phrased in exact DECIMAL cross-multiplied
    * integer form (price·cnt·10 > sum·13) so both engines make identical
    * boundary decisions — no float average on either side. */
  def dsAvgBand(s: SparkSession, dir: String): DataFrame = {
    val typed = Tables.t(s, dir, "lineitem")
      .join(broadcast(Tables.t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .select(col("p_type"), dec(col("l_extendedprice")).as("price"))
    val w = Window.partitionBy(col("p_type"))
    typed
      .withColumn("s", sum(col("price")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("price") * col("cnt") * 10 > col("s") * 13)
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n"), sum(col("price")).cast("double").as("revenue"))
  }

  val dsAvgBandSql: String =
    """WITH typed AS (
      |  SELECT p_type, CAST(l_extendedprice AS DECIMAL(18,2)) AS price
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |stats AS (
      |  SELECT p_type, price,
      |    sum(price) OVER (PARTITION BY p_type) AS s,
      |    count(*) OVER (PARTITION BY p_type) AS cnt
      |  FROM typed)
      |SELECT p_type, count(*) AS n, CAST(sum(price) AS DOUBLE) AS revenue
      |FROM stats WHERE price * cnt * 10 > s * 13
      |GROUP BY p_type""".stripMargin

  /** q88-shape: N independent scalar aggregates over the SAME fact with
    * disjoint filters, cross-joined into one row (TPC-DS q88 counts
    * store_sales across eight time-band/demographic slices). Planner
    * stress: scalar-subquery results as a single-row product; each band
    * is its own pushed-filter scan and the joins are trivially
    * broadcast (1 row each). */
  def dsMultiCount(s: SparkSession, dir: String): DataFrame = {
    def band(name: String, lo: Int, hi: Int): DataFrame =
      Tables.t(s, dir, "lineitem")
        .filter(col("l_quantity") >= lo && col("l_quantity") <= hi)
        .agg(count(lit(1)).as(name))
    band("n1", 1, 10)
      .crossJoin(band("n2", 11, 20))
      .crossJoin(band("n3", 21, 35))
      .crossJoin(band("n4", 36, 50))
  }

  val dsMultiCountSql: String =
    """SELECT
      | (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) AS n1,
      | (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) AS n2,
      | (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 35) AS n3,
      | (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 36 AND 50) AS n4""".stripMargin

  /** q73-shape: per-key fact counts filtered to a HAVING band, then
    * joined back to the dimension (TPC-DS q73 finds customers with 1-5
    * store visits). The aggregate runs BEFORE the join, so the join input
    * is the band survivors, not the raw fact. */
  def dsHavingBand(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.t(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 12 && col("cnt") <= 16)
    counts.join(Tables.t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("cnt"))
  }

  val dsHavingBandSql: String =
    """SELECT c_custkey, c_mktsegment, cnt
      |FROM (SELECT o_custkey, count(*) AS cnt FROM orders
      |      GROUP BY o_custkey HAVING count(*) BETWEEN 12 AND 16) t
      |JOIN customer ON o_custkey = c_custkey""".stripMargin

  /** q14-shape: the key set INTERSECTed across two channel predicates
    * feeds a semi-join back into the fact aggregate (TPC-DS q14's
    * cross_items: items sold in store AND catalog AND web). */
  def dsIntersectItems(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
    val both = li.filter(col("l_quantity") > 45).select(col("l_partkey"))
      .intersect(li.filter(dec(col("l_extendedprice")) < 5000)
        .select(col("l_partkey")))
    li.join(both, Seq("l_partkey"), "left_semi")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_extendedprice"))).cast("double").as("revenue"))
  }

  val dsIntersectItemsSql: String =
    """SELECT count(*) AS n, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem WHERE l_partkey IN (
      |  SELECT l_partkey FROM lineitem WHERE l_quantity > 45
      |  INTERSECT
      |  SELECT l_partkey FROM lineitem
      |  WHERE CAST(l_extendedprice AS DECIMAL(18,2)) < 5000)""".stripMargin

  /** q10/q35-shape: demographic rollup of customers gated by
    * EXISTS(orders) AND (EXISTS(purchases) OR EXISTS(clicks)). The AND'd
    * EXISTS is a LEFT SEMI join; the OR of two EXISTS decorrelates to
    * MARK joins (left join on the distinct key set + flag — the same
    * recipe as `Joins.markJoin`), because a semi-join can't express a
    * disjunction across two subqueries without losing which side
    * matched. Both mark-side key sets are distinct-projected (tiny) and
    * broadcast under AQE; the fact scan never shuffles. */
  def dsCorrelatedExists(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
    def marks(kind: String, flag: String): DataFrame =
      ev.filter(col("event_type") === kind)
        .select(col("user_id").as("c_custkey")).distinct()
        .withColumn(flag, lit(true))
    Tables.t(s, dir, "customer")
      .join(Tables.t(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_semi")
      .join(marks("purchase", "has_p"), Seq("c_custkey"), "left")
      .join(marks("click", "has_k"), Seq("c_custkey"), "left")
      .filter(coalesce(col("has_p"), lit(false)) ||
        coalesce(col("has_k"), lit(false)))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("c_acctbal"))).cast("double").as("bal"))
  }

  val dsCorrelatedExistsSql: String =
    """SELECT c_mktsegment, count(*) AS n,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  AND (EXISTS (SELECT 1 FROM events
      |               WHERE user_id = c_custkey AND event_type = 'purchase')
      |    OR EXISTS (SELECT 1 FROM events
      |               WHERE user_id = c_custkey AND event_type = 'click'))
      |GROUP BY c_mktsegment""".stripMargin

  /** q78-shape: channel union → per-(channel, month) aggregate → ranking
    * window WITHIN each channel, keeping the top months. Distinct from
    * `dsChannelUnion` by the post-aggregate window stage (TPC-DS q78
    * ranks cross-channel ratios the same way): the window partitions by
    * channel, so it reuses the aggregate's hash partitioning — Spark
    * plans ONE exchange for both when keys align (agg on
    * (channel, month) then window on channel needs a re-partition; at
    * scale the window input is already the aggregate's small output, not
    * the fact). */
  def dsUnionWindow(s: SparkSession, dir: String): DataFrame = {
    val chan = Tables.t(s, dir, "orders").select(
        lit("store").as("channel"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month"),
        col("o_totalprice").as("amount"))
      .unionByName(Tables.t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(lit("web").as("channel"),
          to_date(date_trunc("month", col("ts"))).as("month"),
          col("value").as("amount")))
    val tot = chan.groupBy(col("channel"), col("month"))
      .agg(sum(dec(col("amount"))).cast("double").as("total"),
        count(lit(1)).as("n"))
    val w = Window.partitionBy(col("channel"))
      .orderBy(col("total").desc_nulls_last, col("month").asc_nulls_first)
    tot.withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
  }

  val dsUnionWindowSql: String =
    """WITH chan AS (
      |  SELECT 'store' AS channel,
      |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |         o_totalprice AS amount FROM orders
      |  UNION ALL
      |  SELECT 'web' AS channel, CAST(date_trunc('month', ts) AS DATE) AS month,
      |         value AS amount FROM events WHERE event_type = 'purchase'),
      |tot AS (
      |  SELECT channel, month,
      |         CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |         count(*) AS n
      |  FROM chan GROUP BY channel, month)
      |SELECT channel, month, total, n, rk FROM (
      |  SELECT *, rank() OVER (PARTITION BY channel
      |    ORDER BY total DESC NULLS LAST, month ASC NULLS FIRST) AS rk
      |  FROM tot) t
      |WHERE rk <= 3""".stripMargin

  /** q77-shape: ROLLUP over a JOINED star (not a bare fact): customer →
    * nation → region dims broadcast onto the probe, then
    * ROLLUP(region, nation) produces per-nation, per-region, and grand
    * totals in one aggregate (TPC-DS q77 rolls up channel totals the
    * same way). One broadcast join pass + one rollup shuffle. */
  def dsRollupJoin(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "customer")
      .join(broadcast(Tables.t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(dec(col("c_acctbal"))).cast("double").as("bal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_cust"), col("bal"))

  val dsRollupJoinSql: String =
    """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
      |  count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  /** q38-shape: a THREE-way INTERSECT chain of key sets (customers active
    * in each of three consecutive years — fixture dates span 1995-2001)
    * feeding a count — TPC-DS q38's tri-channel intersect. Each leg is
    * its own pushed-filter scan; INTERSECT plans as distinct + joins on
    * the (small) key sets, never on the fact. */
  def dsIntersectChain(s: SparkSession, dir: String): DataFrame = {
    def active(y: Int): DataFrame =
      Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_date(lit(f"$y%04d-01-01")) &&
          col("o_orderdate") < to_date(lit(f"${y + 1}%04d-01-01")))
        .select(col("o_custkey"))
    active(1996).intersect(active(1997)).intersect(active(1998))
      .agg(count(lit(1)).as("n"))
  }

  val dsIntersectChainSql: String =
    """SELECT count(*) AS n FROM (
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
      |  INTERSECT
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
      |  INTERSECT
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= DATE '1998-01-01' AND o_orderdate < DATE '1999-01-01') t""".stripMargin

  /** q51-shape: two channel series aggregated per month, FULL OUTER
    * joined on the period key, then CUMULATIVE windows computed over the
    * joined frame and compared (TPC-DS q51 flags days where the web
    * cumulative overtakes the store cumulative). The outer join keeps
    * months present in only one channel; the running sums are global
    * windows over the tiny post-aggregate frame — the fact is reduced
    * BEFORE any window sees it. */
  def dsCumulCompare(s: SparkSession, dir: String): DataFrame = {
    val store = Tables.t(s, dir, "orders").groupBy(
        to_date(date_trunc("month", col("o_orderdate"))).as("month"))
      .agg(sum(dec(col("o_totalprice"))).as("store_d"))
    val web = Tables.t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(date_trunc("month", col("ts"))).as("month"))
      .agg(sum(dec(col("value"))).as("web_d"))
    val w = Window.orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    store.join(web, Seq("month"), "full_outer")
      .withColumn("cum_store",
        sum(coalesce(col("store_d"), lit(0).cast(DecimalType(18, 2)))).over(w)
          .cast("double"))
      .withColumn("cum_web",
        sum(coalesce(col("web_d"), lit(0).cast(DecimalType(18, 2)))).over(w)
          .cast("double"))
      .filter(col("cum_web") * 100000 > col("cum_store"))
      .select(col("month"), col("cum_store"), col("cum_web"))
  }

  val dsCumulCompareSql: String =
    """WITH store AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS store_d
      |  FROM orders GROUP BY month),
      |web AS (
      |  SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
      |         sum(CAST(value AS DECIMAL(18,2))) AS web_d
      |  FROM events WHERE event_type = 'purchase' GROUP BY month),
      |joined AS (
      |  SELECT coalesce(store.month, web.month) AS month, store_d, web_d
      |  FROM store FULL OUTER JOIN web ON store.month = web.month),
      |cum AS (
      |  SELECT month,
      |    CAST(sum(coalesce(store_d, CAST(0 AS DECIMAL(18,2)))) OVER (
      |      ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_store,
      |    CAST(sum(coalesce(web_d, CAST(0 AS DECIMAL(18,2)))) OVER (
      |      ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_web
      |  FROM joined)
      |SELECT month, cum_store, cum_web FROM cum
      |WHERE cum_web * 100000 > cum_store""".stripMargin

  /** q75-shape: YEAR-OVER-YEAR comparison — one aggregate per (year,
    * segment) self-joined on the shifted year key, reporting the revenue
    * delta for segments that declined (TPC-DS q75's current-vs-prior
    * channel totals). The self-join happens on the tiny post-aggregate
    * frame, never fact-to-fact. */
  def dsYearOverYear(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.t(s, dir, "orders")
      .join(Tables.t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).as("yr"), col("c_mktsegment"))
      .agg(sum(dec(col("o_totalprice"))).as("rev_d"), count(lit(1)).as("n"))
    val cur = rev.select(col("yr"), col("c_mktsegment"),
      col("rev_d").as("cur_d"), col("n").as("cur_n"))
    val prev = rev.select((col("yr") + 1).as("yr"), col("c_mktsegment"),
      col("rev_d").as("prev_d"), col("n").as("prev_n"))
    cur.join(prev, Seq("yr", "c_mktsegment"))
      .filter(col("cur_d") < col("prev_d"))
      .select(col("yr"), col("c_mktsegment"),
        col("cur_d").cast("double").as("cur_rev"),
        col("prev_d").cast("double").as("prev_rev"),
        (col("prev_d") - col("cur_d")).cast("double").as("decline"))
  }

  val dsYearOverYearSql: String =
    """WITH rev AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS yr, c_mktsegment,
      |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d, count(*) AS n
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY yr, c_mktsegment)
      |SELECT cur.yr AS yr, cur.c_mktsegment AS c_mktsegment,
      |  CAST(cur.rev_d AS DOUBLE) AS cur_rev,
      |  CAST(prev.rev_d AS DOUBLE) AS prev_rev,
      |  CAST(prev.rev_d - cur.rev_d AS DOUBLE) AS decline
      |FROM rev cur JOIN rev prev
      |  ON cur.yr = prev.yr + 1 AND cur.c_mktsegment = prev.c_mktsegment
      |WHERE cur.rev_d < prev.rev_d""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_cumul_compare" -> (dsCumulCompare _),
    "ds_year_over_year" -> (dsYearOverYear _),
    "ds_correlated_exists" -> (dsCorrelatedExists _),
    "ds_union_window" -> (dsUnionWindow _),
    "ds_rollup_join" -> (dsRollupJoin _),
    "ds_intersect_chain" -> (dsIntersectChain _),
    "ds_multi_count" -> (dsMultiCount _),
    "ds_having_band" -> (dsHavingBand _),
    "ds_intersect_items" -> (dsIntersectItems _),
    "ds_window_rollup" -> (dsWindowRollup _),
    "ds_cte_reuse" -> (dsCteReuse _),
    "ds_two_fact" -> (dsTwoFact _),
    "ds_channel_union" -> (dsChannelUnion _),
    "ds_avg_band" -> (dsAvgBand _))

  val oracle: Map[String, String] = Map(
    "ds_cumul_compare" -> dsCumulCompareSql,
    "ds_year_over_year" -> dsYearOverYearSql,
    "ds_correlated_exists" -> dsCorrelatedExistsSql,
    "ds_union_window" -> dsUnionWindowSql,
    "ds_rollup_join" -> dsRollupJoinSql,
    "ds_intersect_chain" -> dsIntersectChainSql,
    "ds_multi_count" -> dsMultiCountSql,
    "ds_having_band" -> dsHavingBandSql,
    "ds_intersect_items" -> dsIntersectItemsSql,
    "ds_window_rollup" -> dsWindowRollupSql,
    "ds_cte_reuse" -> dsCteReuseSql,
    "ds_two_fact" -> dsTwoFactSql,
    "ds_channel_union" -> dsChannelUnionSql,
    "ds_avg_band" -> dsAvgBandSql)
}
