package graft.compaction

/** UCB1 multi-armed bandit tuning the compaction target online — the
  * "learning compaction" component of the reference (reference
  * `src/include/duckdb/common/negative_feedback.hpp:21-262`: UCB1 over
  * threshold arms {32,64,128,256,384,512,768,1024} with wall-clock
  * negative reward; the snapshot defines the bandit but leaves it unwired
  * — here it is wired to AQE's advisory partition size and fed by
  * `ChunkMetrics`/stage timings).
  *
  * Arm 0 is the sentinel `DefaultArm` (0 bytes): the PRODUCTION DEFAULT
  * configuration (parallelism-first AQE, no binding size target). With the
  * default in the arm family the tuner cannot lose to production by
  * construction — when no bound target beats it, UCB1 converges back to
  * it (round-8 flood measurements showed every bound arm losing to
  * default ~2×, which a bound-only family could never report).
  *
  * Pure driver-side state: decisions happen between queries/stages, never
  * on the data path, so cluster scale is irrelevant to its cost.
  */
class CompactTuner(
    val arms: IndexedSeq[Long] = CompactTuner.DefaultArm +:
      IndexedSeq(32L, 64, 128, 256, 384, 512, 768, 1024).map(_ << 20), // bytes
    explorationC: Double = math.sqrt(2.0)) {

  private val counts = Array.fill(arms.length)(0L)
  private val sums = Array.fill(arms.length)(0.0)
  private var total = 0L

  /** UCB1 selection: any unplayed arm first, then
    * argmax(mean + c·√(ln N / nᵢ)). Rewards are negative costs (the
    * reference's "negative feedback"): lower latency ⇒ higher reward. */
  def selectArm(): Int = {
    val unplayed = counts.indexWhere(_ == 0L)
    if (unplayed >= 0) return unplayed
    var best = 0
    var bestScore = Double.NegativeInfinity
    var i = 0
    while (i < arms.length) {
      val mean = sums(i) / counts(i)
      val score = mean + explorationC * math.sqrt(math.log(total.toDouble) / counts(i))
      if (score > bestScore) { bestScore = score; best = i }
      i += 1
    }
    best
  }

  /** Record the observed cost (e.g. stage wall-clock seconds) for an arm. */
  def updateArm(arm: Int, costSeconds: Double): Unit = {
    require(arm >= 0 && arm < arms.length)
    counts(arm) += 1
    sums(arm) += -costSeconds
    total += 1
  }

  def bestArm: Int = {
    var best = 0
    var bestMean = Double.NegativeInfinity
    var i = 0
    while (i < arms.length) {
      if (counts(i) > 0) {
        val mean = sums(i) / counts(i)
        if (mean > bestMean) { bestMean = mean; best = i }
      }
      i += 1
    }
    best
  }

  def targetBytes: Long = arms(bestArm)

  def plays(arm: Int): Long = counts(arm)

  /** Reset between queries (reference resets its bandit per query,
    * `vector_compaction.cpp:22`). */
  def reset(): Unit = {
    java.util.Arrays.fill(counts, 0L)
    java.util.Arrays.fill(sums, 0.0)
    total = 0L
  }
}

object CompactTuner {
  /** Sentinel arm value: the production-default (unbound, parallelism-
    * first) configuration rather than a binding byte target. */
  val DefaultArm: Long = 0L
}
