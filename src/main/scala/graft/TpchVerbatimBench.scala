package graft

/** Timing for the reference's REAL TPC-H suite run VERBATIM
  * ([[sql.TpchVerbatim]]: the 22 query texts under
  * `reference/extension/tpch/dbgen/queries/`, unmodified, over the
  * staged dbgen parquet corpus) — the engine side of the same-box
  * apples-to-apples comparison whose DuckDB twin is
  * `scripts/bench_tpch_duckdb.py` (identical SQL, identical parquet
  * files, same warm best-of-N protocol).
  *
  * Emits one JSON line (per-query best seconds + total) and writes
  * `bench_evidence/r16_tpch_verbatim.json`. Dev artifact like
  * TpchBench — the driver's one-line contract stays `graft.Bench`.
  * Run: `SPARK_GRAFT_TPCH_SCALE=sf0.1 sbt "runMain graft.TpchVerbatimBench"`.
  */
object TpchVerbatimBench {
  def main(args: Array[String]): Unit = {
    val scale = sys.env.getOrElse("SPARK_GRAFT_TPCH_SCALE", "sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_TPCH_BENCH_OUT",
      s"bench_evidence/r16_tpch_verbatim.json")
    // codegen cache sized for 22 queries × warm+timed executions — at
    // the 100-entry default every execution re-compiles its generated
    // stages (Janino ~100-300 ms each), swamping the query time (same
    // fix TpchBench ships)
    val spark = EngineSession.builder(s"local[$cpus]", 32)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the headline Bench's tuned conf: broadcast generously, keep
    // exchanges narrow, and SPLIT the single-file dbgen parquet — the
    // staged tables are one file each, so without a small partition
    // target lineitem@sf1 (≈200 MB) scans as 2 tasks on a 32-core box
    // measured A/B on the 5 hottest queries at sf1 (warm JVM, 3-run min):
    // {10 MB broadcast, 32 shuffle partitions, AQE} 4.47 s vs
    // {64 MB, 32, AQE} 6.90 s — the 64 MB threshold broadcasts
    // orders/customer at sf1 and the driver-side single-threaded hash
    // build dominates (q5 2.29 s → 0.76 s once those become 32-way
    // shuffle joins). The production posture (EngineSession defaults)
    // wins here; dimensions still broadcast under 10 MB.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (10 << 20).toString)
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_TPCH_SHUFFLE", "32"))
    spark.conf.set("spark.sql.adaptive.enabled",
      sys.env.getOrElse("SPARK_GRAFT_TPCH_AQE", "true"))
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    spark.conf.set("spark.sql.files.openCostInBytes", "8m")
    // the fixture dir argument only selects the scale for TpchVerbatim
    val dirForScale = s"/root/testdata/$scale"
    def once(n: Int): Double = {
      val t0 = System.nanoTime()
      sql.TpchVerbatim.run(spark, dirForScale, n)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm TWICE: the first sweep pays codegen-compile + footer caches,
    // the second gets C2 JIT onto the join/agg loops (measured: single-
    // warm best-of-3 ran 2-4x slower on the join-heavy queries)
    (1 to 22).foreach(once); (1 to 22).foreach(once)
    val best = (1 to 22).map { n =>
      n -> (1 to runs).map(_ => once(n)).min
    }
    val total = best.map(_._2).sum
    val json = best.map { case (n, s) =>
      f""""q$n%02d":${"%.3f".format(s)}""" }
      .mkString(
        s"""{"metric":"tpch_verbatim_total","value":${"%.3f".format(total)},""" +
          s""""unit":"sec","runs":$runs,"scale":"$scale","queries":{""",
        ",", "}}")
    try {
      val w = new java.io.PrintWriter(new java.io.File(out), "UTF-8")
      try w.println(json) finally w.close()
      System.err.println(s"[tpch-bench] record -> $out")
    } catch { case e: Throwable =>
      System.err.println(s"[tpch-bench] write failed (${e.getMessage})")
    }
    println(json)
    spark.stop()
  }
}
