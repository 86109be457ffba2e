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
}
