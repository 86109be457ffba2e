package graft

/** Full TPC-H-analog suite timing in the reference benchmark-runner's
  * output format: one `name,run,timing` CSV line per run (reference
  * `benchmark/benchmark_runner.cpp`, `README.md:40-49` — the same
  * interface its `.benchmark` specs emit), over the same staged layout
  * and session configuration the headline Bench uses. Dev artifact:
  * breadth evidence across all 22 planner shapes, not the driver's
  * one-line JSON contract (that stays `graft.Bench`). Run:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.TpchBench"`. */
object TpchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = EngineSession.builder(s"local[$cpus]", 8)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val benchDir = Bench.stageFixtures(spark, sfDir, cpus)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    spark.conf.set("spark.sql.files.openCostInBytes", "8m")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 << 20).toString)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    val suite = Seq(
      "q1_pricing", "q2_mincost", "q3_shipping", "q4_exists", "q5_region",
      "q6_forecast", "q7_volume", "q8_mktshare", "q9_profit", "q10_returned",
      "q11_important", "q12_classes", "q13_custdist", "q14_promo",
      "q15_topsupp", "q16_suppcnt", "q17_smallqty", "q18_bigorders",
      "q19_disjunct", "q20_nested", "q21_waiting", "q22_inactive")
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, benchDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    suite.foreach(once) // warm: codegen + staged-footer caches
    println("name,run,timing")
    var total = 0.0
    suite.foreach { n =>
      var best = Double.MaxValue
      (1 to runs).foreach { r =>
        val t = once(n)
        best = math.min(best, t)
        println(f"$n,$r,$t%.6f")
      }
      total += best
    }
    println(f"# total(best-of-$runs): $total%.3f s")
    spark.stop()
  }
}
