package graft

import org.apache.spark.sql.functions._

/** Dev tool: the three 2-inequality join strategies side by side —
  * whole-stage-codegen BNLJ (Spark's default, needs a broadcastable
  * side), the custom IEJoinExec kernel (spark.graft.iejoin), and the
  * distributed blocked IEJoin (operators.ScaleJoins.ieJoinBlocked, no
  * broadcast requirement — the 100 TB path). */
object IEBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = EngineSession.local(32)

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count() // warm
      val t0 = System.nanoTime()
      val n = mk.collect()(0).getLong(0)
      println(s"RESULT $label: ${(System.nanoTime() - t0) / 1e9}s n=$n")
    }

    // Shape 1: part self-join (small build side — BNLJ's home turf).
    val p1 = Tables.t(spark, dir, "part")
      .select(col("p_size").as("s1"), col("p_retailprice").as("r1"))
    val p2 = Tables.t(spark, dir, "part")
      .select(col("p_size").as("s2"), col("p_retailprice").as("r2"))
    val q = p1.join(p2, col("s1") < col("s2") && col("r1") > col("r2"))
      .agg(count(lit(1)))
    spark.conf.set("spark.graft.iejoin", "true")
    time("part-self iejoin-exec")(q)
    spark.conf.set("spark.graft.iejoin", "false")
    time("part-self bnlj")(q)
    time("part-self blocked") {
      operators.ScaleJoins.ieJoinBlocked(
          p1.withColumn("s1", col("s1").cast("double")),
          p2.withColumn("s2", col("s2").cast("double")),
          "s1", "s2", "<", "r1", "r2", ">", blocks = 32)
        .agg(count(lit(1)))
    }

    // Shape 2: orders half-year self-join (neither side broadcastable at
    // scale — the distributed-IEJoin regime; BNLJ timed with broadcast
    // disabled to model it).
    val base = Tables.t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val x = base.select(
      unix_micros(col("o_orderdate").cast("timestamp")).cast("double").as("a1"),
      col("o_totalprice").as("b1"))
    val y = base.select(
      unix_micros(col("o_orderdate").cast("timestamp")).cast("double").as("a2"),
      col("o_totalprice").as("b2"))
    time("orders-self blocked") {
      operators.ScaleJoins.ieJoinBlocked(x, y, "a1", "a2", "<", "b1", "b2", ">", blocks = 32)
        .agg(count(lit(1)))
    }
    val noBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("orders-self bnlj-nobroadcast") {
      x.join(y, col("a1") < col("a2") && col("b1") > col("b2")).agg(count(lit(1)))
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", noBc)
    spark.stop()
  }
}
