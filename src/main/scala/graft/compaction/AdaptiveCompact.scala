package graft.compaction

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Closed-loop adaptive compaction: per episode, the UCB1 tuner picks a
  * partition-size arm, the episode runs with AQE's advisory size set to
  * it, and the observed wall-clock feeds back as negative reward — the
  * wired-up version of the reference's learning compaction (reference
  * `negative_feedback.hpp` defines the bandit; the snapshot never calls
  * SelectArm/UpdateArm from the operator path — here the loop is closed).
  *
  * Driver-side control only: the data path is untouched between episodes,
  * so this works identically on a 1000-executor cluster (the advisory
  * size is a cluster-wide AQE conf).
  */
class AdaptiveCompact(spark: SparkSession, val tuner: CompactTuner = new CompactTuner) {

  case class Episode(arm: Int, targetBytes: Long, seconds: Double)

  private val log = scala.collection.mutable.ArrayBuffer.empty[Episode]

  /** Run one tuning episode of `work` (any action-triggering function). */
  def episode(work: SparkSession => Unit): Episode = {
    val arm = tuner.selectArm()
    val target = tuner.arms(arm)
    Compact.enableAqeCompaction(spark, target, bindTarget = true)
    val t0 = System.nanoTime()
    work(spark)
    val secs = (System.nanoTime() - t0) / 1e9
    tuner.updateArm(arm, secs)
    val ep = Episode(arm, target, secs)
    log += ep
    ep
  }

  /** Run `n` episodes and settle on the best arm's target. */
  def tune(n: Int)(work: SparkSession => Unit): Long = {
    (1 to n).foreach(_ => episode(work))
    val best = tuner.targetBytes
    Compact.enableAqeCompaction(spark, best, bindTarget = true)
    best
  }

  def history: Seq[Episode] = log.toSeq
}
