package graft.compaction

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Partition/batch-size metrology — the Spark re-expression of the
  * reference's chunk-size profilers (reference
  * `src/include/duckdb/common/profiler.hpp:235-332` ZebraProfiler
  * per-chunk-size histograms, `:335-432` HashJoinProfiler and its "chunk
  * factor" = input-chunks / output-chunks per probe).
  *
  * In Spark the "chunk" is the task partition: this listener folds task
  * metrics into log2-bucketed histograms of records-per-task per stage,
  * and exposes a stage-level chunk factor (input records / output records)
  * — small-fragment proliferation after selective operators shows up as
  * mass in the low buckets, exactly the pathology the paper's compaction
  * removes.
  */
class ChunkMetrics extends SparkListener {

  /** log2 bucket index for a record count (bucket i covers [2^i, 2^(i+1))). */
  private[compaction] def bucket(n: Long): Int =
    if (n <= 0) 0 else math.min(63, 64 - java.lang.Long.numberOfLeadingZeros(n) - 1)

  case class StageStats(
      var tasks: Long = 0L,
      var inputRecords: Long = 0L,
      var shuffleReadRecords: Long = 0L,
      var shuffleWriteRecords: Long = 0L,
      var shuffleWriteBytes: Long = 0L,
      var wallMillis: Long = 0L,
      histogram: Array[Long] = new Array[Long](64))

  private val stages = TrieMap.empty[Int, StageStats]

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
    val info = ev.stageInfo
    val st = stages.getOrElseUpdate(info.stageId, StageStats())
    st.synchronized {
      st.wallMillis = (for {
        s <- info.submissionTime; c <- info.completionTime
      } yield c - s).getOrElse(0L)
    }
  }

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
    val m = ev.taskMetrics
    if (m != null) {
      val st = stages.getOrElseUpdate(ev.stageId, StageStats())
      st.synchronized {
        st.tasks += 1
        st.inputRecords += m.inputMetrics.recordsRead
        st.shuffleReadRecords += m.shuffleReadMetrics.recordsRead
        st.shuffleWriteRecords += m.shuffleWriteMetrics.recordsWritten
        st.shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
        val processed = math.max(m.inputMetrics.recordsRead,
          m.shuffleReadMetrics.recordsRead)
        st.histogram(bucket(processed)) += 1
      }
    }
  }

  def snapshot: Map[Int, StageStats] = stages.toMap

  /** Records-in / records-out per stage — the chunk-factor analog: high
    * values mean downstream stages would see many small fragments. */
  def chunkFactor(stageId: Int): Option[Double] =
    stages.get(stageId).collect {
      case s if s.shuffleWriteRecords > 0 =>
        math.max(s.inputRecords, s.shuffleReadRecords).toDouble / s.shuffleWriteRecords
    }

  /** Fraction of tasks that processed fewer than `threshold` records —
    * the trigger condition of the reference's dynamic compaction
    * (`chunk.size() < compact_threshold`, reference
    * `src/execution/physical_operator.cpp:266`). */
  def smallTaskFraction(threshold: Long): Double = {
    val all = stages.values.toSeq
    val total = all.map(_.tasks).sum
    if (total == 0) return 0.0
    val cut = bucket(threshold)
    val small = all.map(_.histogram.take(cut + 1).sum).sum
    small.toDouble / total
  }

  def reset(): Unit = stages.clear()

  def install(spark: SparkSession): this.type = {
    spark.sparkContext.addSparkListener(this)
    this
  }
}
