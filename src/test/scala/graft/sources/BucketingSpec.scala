package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join on matching bucket counts plans without a shuffle") {
    // warehouse dir is a static conf — tables land in ./spark-warehouse
    // (gitignored) and are dropped afterward
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ord = graft.Tables.t(spark, sf(), "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val li = graft.Tables.t(spark, sf(), "lineitem")
        .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
      Bucketing.writeBucketed(ord, "ord_b", "o_orderkey", 8)
      Bucketing.writeBucketed(li, "li_b", "o_orderkey", 8)

      val joined = Bucketing.bucketJoin(spark, "ord_b", "li_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      // and correct:
      assert(joined.count() ==
        ord.join(li, "o_orderkey").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS ord_b")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    try {
      val ord = graft.Tables.t(spark, sf(), "orders")
        .select($"o_orderkey", $"o_totalprice")
      Bucketing.writeBucketed(ord, "ord_b2", "o_orderkey", 8)
      val agg = spark.table("ord_b2").groupBy($"o_orderkey")
        .agg(sum($"o_totalprice"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS ord_b2")
  }
}
