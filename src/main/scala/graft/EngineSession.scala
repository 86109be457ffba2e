package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the engine: AQE with compaction-oriented
  * coalescing on (the always-on analog of the reference's dynamic chunk
  * compaction — SURVEY.md §4.2), UTC, right-sized shuffle parallelism, and
  * the graft optimizer extensions registered.
  */
object EngineSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", math.max(cores, 8)).getOrCreate()
    compaction.Compact.enableAqeCompaction(s)
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
