package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates for the reference's aggregate-library gaps
  * (reference `src/core_functions/aggregate/distributive/entropy.cpp`,
  * `nested/histogram.cpp`): implemented as `Aggregator[IN, BUF, OUT]` so
  * Spark runs them partial→merge→finish — distributed, map-side combined,
  * no driver collection. Buffers are count maps keyed by the (string-ized)
  * value: bounded by distinct-value count, not row count.
  */
object GraftAggregators {

  /** Shannon entropy (log base 2) of a column's value distribution. */
  class EntropyAggregator extends Aggregator[String, Map[String, Long], Double] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) b else b.updated(v, b.getOrElse(v, 0L) + 1L)

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      if (a.size < b.size) merge(b, a)
      else b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

    override def finish(m: Map[String, Long]): Double = {
      val total = m.valuesIterator.sum.toDouble
      if (total == 0) return 0.0
      var h = 0.0
      m.valuesIterator.foreach { c =>
        val p = c / total
        h -= p * (math.log(p) / math.log(2.0))
      }
      h
    }

    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** product() — multiplicative aggregate (reference
    * `distributive/product.cpp`); exact for integral doubles. */
  class ProductAggregator extends Aggregator[Double, Double, Double] {
    override def zero: Double = 1.0
    override def reduce(b: Double, v: Double): Double = b * v
    override def merge(a: Double, b: Double): Double = a * b
    override def finish(b: Double): Double = b
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Value histogram as a sorted (value, count) association — the map-typed
    * sibling of the relational `GROUP BY value` phrasing. */
  class HistogramAggregator extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) b else b.updated(v, b.getOrElse(v, 0L) + 1L)

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

    override def finish(m: Map[String, Long]): Map[String, Long] = m

    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  case class HeavyHitter(value: String, count_est: Long, max_err: Long)

  /** Space-Saving heavy hitters (Metwally, Agrawal, El Abbadi 2005) —
    * top-k frequent values in bounded memory, the sketch behind
    * approx-top-k aggregates: at most `capacity` (value, count, err)
    * counters regardless of stream length; a new value beyond capacity
    * evicts the minimum counter m and inherits (m.count+1, err=m.count).
    * The classic guarantees carry over: every tracked value's true count
    * lies in [count_est − max_err, count_est], and any value with true
    * frequency > N/capacity is tracked. Merge sums matching counters
    * (errors add) and prunes the union back to capacity, charging
    * dropped counters' counts into the survivors' error — so the
    * partial→merge→finish path Spark runs keeps the bound.
    *
    * EXACT whenever the observed distinct count stays ≤ capacity: no
    * eviction ever fires, every err is 0, and merge is plain map-sum —
    * the regime the oracle entry pins (its SQL twin is a plain GROUP BY
    * count); the approximation bound under eviction is spec-tested on a
    * synthetic skewed stream. */
  class SpaceSavingAggregator(capacity: Int, k: Int)
      extends Aggregator[String, Map[String, (Long, Long)], Seq[HeavyHitter]] {

    override def zero: Map[String, (Long, Long)] = Map.empty

    override def reduce(b: Map[String, (Long, Long)], v: String): Map[String, (Long, Long)] =
      if (v == null) b
      else b.get(v) match {
        case Some((c, e)) => b.updated(v, (c + 1L, e))
        case None if b.size < capacity => b.updated(v, (1L, 0L))
        case None =>
          val (mv, (mc, _)) = b.minBy { case (key, (c, _)) => (c, key) }
          (b - mv).updated(v, (mc + 1L, mc))
      }

    override def merge(a: Map[String, (Long, Long)],
        b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
      val union = b.foldLeft(a) { case (m, (key, (c, e))) =>
        m.get(key) match {
          case Some((c0, e0)) => m.updated(key, (c0 + c, e0 + e))
          case None => m.updated(key, (c, e))
        }
      }
      if (union.size <= capacity) union
      else {
        // keep the capacity largest counters; charge the largest dropped
        // count into every survivor's error budget (standard mergeable
        // space-saving: a dropped value's occurrences may hide anywhere)
        val sorted = union.toSeq.sortBy { case (key, (c, _)) => (-c, key) }
        val (kept, dropped) = sorted.splitAt(capacity)
        val charge = dropped.headOption.map(_._2._1).getOrElse(0L)
        kept.map { case (key, (c, e)) => key -> (c + charge, e + charge) }.toMap
      }
    }

    override def finish(m: Map[String, (Long, Long)]): Seq[HeavyHitter] =
      m.toSeq.sortBy { case (key, (c, _)) => (-c, key) }
        .take(k)
        .map { case (key, (c, e)) => HeavyHitter(key, c, e) }

    override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
      Encoders.kryo[Map[String, (Long, Long)]]
    override def outputEncoder: Encoder[Seq[HeavyHitter]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HeavyHitter]]()
  }
}
