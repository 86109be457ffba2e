package graft

/** Dev tool: dump formatted physical plans for the headline queries and
  * flag scale smells — missing parquet filter pushdown, full-width scans,
  * cartesian products where a broadcast was expected. Run:
  * `sbt "runMain graft.PlanCheck [sfDir] [query...]"`. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q1_pricing", "q3_shipping", "q5_region", "q10_returned",
        "join_asof", "agg_rollup", "win_rank", "shape_unnest",
        "ann_topk", "text_stats", "compact_filter")
    val spark = EngineSession.local(8)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"\n========== $n ==========")
      println(plan)
      val smells = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "no-pushdown(scan w/o PushedFilters)" ->
          (plan.contains("PushedFilters: []") && plan.contains("Filter ")),
        "SortMergeJoin(on small input?)" -> plan.contains("SortMergeJoin"))
      smells.filter(_._2).foreach { case (s, _) => println(s"  [smell] $s") }
    }
    spark.stop()
  }
}
