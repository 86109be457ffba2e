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
    val spark = EngineSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // the headline Bench's tuned conf: the suite is joins+aggs over a
    // ~40 MB corpus — broadcast generously, keep exchanges narrow
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 << 20).toString)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // the fixture dir argument only selects the scale for TpchVerbatim
    val dirForScale = s"/root/testdata/$scale"
    def once(n: Int): Double = {
      val t0 = System.nanoTime()
      sql.TpchVerbatim.run(spark, dirForScale, n)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 22).foreach(once) // warm: codegen + footer caches
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
