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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_multi_count" -> (dsMultiCount _),
    "ds_having_band" -> (dsHavingBand _),
    "ds_intersect_items" -> (dsIntersectItems _),
    "ds_window_rollup" -> (dsWindowRollup _),
    "ds_cte_reuse" -> (dsCteReuse _),
    "ds_two_fact" -> (dsTwoFact _),
    "ds_channel_union" -> (dsChannelUnion _),
    "ds_avg_band" -> (dsAvgBand _))

  val oracle: Map[String, String] = Map(
    "ds_multi_count" -> dsMultiCountSql,
    "ds_having_band" -> dsHavingBandSql,
    "ds_intersect_items" -> dsIntersectItemsSql,
    "ds_window_rollup" -> dsWindowRollupSql,
    "ds_cte_reuse" -> dsCteReuseSql,
    "ds_two_fact" -> dsTwoFactSql,
    "ds_channel_union" -> dsChannelUnionSql,
    "ds_avg_band" -> dsAvgBandSql)
}
