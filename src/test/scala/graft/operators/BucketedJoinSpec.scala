package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The point of bucketing is EXCHANGE ELIMINATION: with broadcast off
  * (the 100 TB regime — neither fact side fits an executor), the
  * bucketed join must run as a sort-merge join with ZERO shuffles below
  * the join, while the same join on plain parquet pays two. */
class BucketedJoinSpec extends SparkSpec {

  private def withBroadcastOff[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("bucketed join plans with no exchange below the join; plain join pays two") {
    withBroadcastOff {
      val df = ScaleJoins.bucketedJoin(spark, sf())
      val p = df.queryExecution.executedPlan.toString
      // the only exchange allowed is the final 5-group aggregate's
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(p.contains("SortMergeJoin"), "co-located facts must sort-merge join")
      assert(exchanges <= 1,
        s"bucketed join must not shuffle either side, saw $exchanges exchanges:\n$p")

      val plain = graft.Tables.t(spark, sf(), "orders")
        .select("o_orderkey", "o_orderpriority")
        .join(graft.Tables.t(spark, sf(), "lineitem")
            .select("l_orderkey", "l_extendedprice"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val plainExchanges =
        "Exchange".r.findAllIn(plain.queryExecution.executedPlan.toString).length
      assert(plainExchanges >= 3,
        s"plain join should shuffle both sides + aggregate, saw $plainExchanges")
    }
  }

  test("bucketing is layout, not semantics: result equals the plain join") {
    val bucketed = ScaleJoins.bucketedJoin(spark, sf())
      .orderBy("o_orderpriority").collect()
    import org.apache.spark.sql.types.DecimalType
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
    val plain = graft.Tables.t(spark, sf(), "orders")
      .join(graft.Tables.t(spark, sf(), "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority").collect()
    assert(bucketed.length == plain.length)
    bucketed.zip(plain).foreach { case (b, q) =>
      assert(b.getString(0) == q.getString(0))
      assert(b.getLong(1) == q.getLong(1))
      assert(math.abs(b.getDouble(2) - q.getDouble(2)) < 1e-6)
    }
  }
}
