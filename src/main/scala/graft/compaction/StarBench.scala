package graft.compaction

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compaction micro-benchmark — the FIXTURES.md §3 fixture mirroring the
  * reference's 4-table star join experiment (reference
  * `vector_compaction.cpp:49-140`: student ⋈ room ⋈ department ⋈ type
  * with selective probe filter `stu_id ≤ N/10`), generated in-engine via
  * `spark.range` (distributed, deterministic, no files).
  *
  * The selective probe is the chunk-fragmentation trigger: after the
  * filter, each scan task carries ~10%-full "chunks". The benchmark runs
  * the join with AQE compaction at a tight target vs effectively off, and
  * reports the `ChunkMetrics` small-task fraction + per-stage chunk
  * factor — the paper's measurement, at partition granularity.
  */
object StarBench {

  case class Tables(student: DataFrame, department: DataFrame,
      room: DataFrame, typeT: DataFrame)

  /** Deterministic star-schema generator; default 1/100 of the reference
    * scale to fit CI (reference: student 5e7 / room 5e7 / dept 5e6 /
    * type 5e6). */
  def gen(spark: SparkSession, n: Long = 500000L): Tables = {
    val nDim = math.max(n / 10, 1)
    val student = spark.range(n).select(
      col("id").as("stu_id"),
      pmod(xxhash64(col("id"), lit(1)), lit(nDim)).cast("int").as("major_id"),
      (pmod(xxhash64(col("id"), lit(2)), lit(5)) + 18).cast("int").as("age"))
    val department = spark.range(nDim).select(
      col("id").cast("int").as("major_id"),
      concat(lit("dept_"), col("id")).as("name"))
    val room = spark.range(n).select(
      col("id").as("room_id"),
      pmod(xxhash64(col("id"), lit(3)), lit(n)).as("stu_id"),
      pmod(xxhash64(col("id"), lit(4)), lit(nDim)).cast("int").as("type"))
    val typeT = spark.range(nDim).select(
      col("id").cast("int").as("type"),
      concat(lit("type_"), col("id")).as("info"))
    Tables(student, department, room, typeT)
  }

  /** The reference's probe-side-filtered star join. */
  def starJoin(t: Tables, n: Long): DataFrame =
    t.student.filter(col("stu_id") <= n / 10)
      .join(t.room, "stu_id")
      .join(t.department, "major_id")
      .join(t.typeT, "type")
      .agg(count(lit(1)).as("n_rows"), sum(col("age").cast("long")).as("sum_age"))

  case class Run(label: String, seconds: Double, rows: Long,
      smallTaskFraction: Double)

  def run(spark: SparkSession, n: Long, targetBytes: Long, label: String,
      metrics: ChunkMetrics): Run = {
    Compact.enableAqeCompaction(spark, targetBytes)
    metrics.reset()
    val t = gen(spark, n)
    val t0 = System.nanoTime()
    val row = starJoin(t, n).collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    val deadline = System.currentTimeMillis() + 5000
    while (metrics.snapshot.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    Run(label, secs, row.getLong(0), metrics.smallTaskFraction(256))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = graft.EngineSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val metrics = new ChunkMetrics().install(spark)
    run(spark, n, 64L << 20, "warmup", metrics) // codegen/JIT warm-up
    val loose = run(spark, n, 1L << 30, "compact_off(1gb)", metrics)
    val tight = run(spark, n, 1L << 20, "compact_1mb", metrics)
    Seq(tight, loose).foreach { r =>
      println(f"""{"bench":"star","label":"${r.label}","sec":${r.seconds}%.3f,"rows":${r.rows},"small_task_fraction":${r.smallTaskFraction}%.3f}""")
    }
    assert(tight.rows == loose.rows, "compaction changed results!")
    spark.stop()
  }
}
