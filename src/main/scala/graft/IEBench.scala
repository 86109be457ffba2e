package graft

import org.apache.spark.sql.functions._

/** Dev tool: IEJoin vs BroadcastNestedLoop on a 2-inequality self-join. */
object IEBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = EngineSession.local(32)
    val p1 = Tables.t(spark, dir, "part")
      .select(col("p_size").as("s1"), col("p_retailprice").as("r1"))
    val p2 = Tables.t(spark, dir, "part")
      .select(col("p_size").as("s2"), col("p_retailprice").as("r2"))
    val q = p1.join(p2, col("s1") < col("s2") && col("r1") > col("r2"))
      .agg(count(lit(1)))
    def time(label: String): Unit = {
      q.count() // warm
      val t0 = System.nanoTime()
      val n = q.collect()(0).getLong(0)
      println(s"RESULT $label: ${(System.nanoTime() - t0) / 1e9}s n=$n")
    }
    spark.conf.set("spark.graft.iejoin", "true")
    time("iejoin")
    spark.conf.set("spark.graft.iejoin", "false")
    time("bnlj")
    spark.stop()
  }
}
