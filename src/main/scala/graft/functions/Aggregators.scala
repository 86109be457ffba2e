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

  /** Compensated floating-point sum (reference
    * `src/core_functions/aggregate/algebraic/` `kahan_sum` a.k.a. fsum;
    * Neumaier 1974's improved Kahan summation). Buffer is (sum,
    * compensation); `reduce` does the Neumaier step — the compensation
    * absorbs whichever operand loses low-order bits — and `merge` adds
    * the two sums AND the two compensations with the same step, so the
    * partial→merge path stays compensated end to end. At 100 TB this is
    * the difference between a revenue total that drifts with partition
    * count and one that is correctly rounded regardless: a billion-row
    * naive double sum accumulates O(n·ulp) error; compensated summation
    * keeps it at O(1) ulp for non-pathological data. Cross-engine FLOAT
    * equality at the last bit is not a contract ANY engine pair offers
    * (DuckDB's own docs call its ordering thread-dependent), so this is
    * spec-pinned (recovers catastrophic cancellation a naive fold loses;
    * equals the BigDecimal ground truth under adversarial partitioning)
    * rather than oracle-hashed. */
  class KahanSumAggregator extends Aggregator[Double, (Double, Double), Double] {
    private def add(sum: Double, c: Double, v: Double): (Double, Double) = {
      val t = sum + v
      val comp =
        if (math.abs(sum) >= math.abs(v)) c + ((sum - t) + v)
        else c + ((v - t) + sum)
      (t, comp)
    }
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), v: Double): (Double, Double) =
      add(b._1, b._2, v)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) = {
      val (s, c) = add(a._1, a._2 + b._2, b._1)
      (s, c)
    }
    override def finish(b: (Double, Double)): Double = b._1 + b._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Reservoir-sampled quantile (reference
    * `src/core_functions/aggregate/holistic/reservoir_quantile.cpp`) —
    * the bounded-memory quantile DuckDB ships for corpora too large to
    * sort: a uniform reservoir of at most `capacity` values per group,
    * quantile_disc over the sample. The sample is maintained as
    * BOTTOM-K BY RANDOM KEY (the mergeable formulation of reservoir
    * sampling), so Spark's partial→merge→finish path keeps the state ≤
    * 2·capacity at every stage regardless of corpus size and the merge
    * is order-independent given the keys.
    *
    * Semantics contract, mirroring the reference exactly: when the
    * group's row count exceeds `capacity` the result is SAMPLED — a
    * bounded-error estimate whose draw depends on partitioning, just
    * as the reference's depends on thread interleaving (its docs call
    * the function non-deterministic). When the row count is ≤ capacity
    * the reservoir never evicts, the merge degenerates to
    * concatenation, and the result is the EXACT quantile_disc
    * (ceil(q·n) convention, the one `agg_quantile_disc` pins) — the
    * regime the oracle entry runs in; the sampled regime's error bound
    * is property-tested in the suite. */
  class ReservoirQuantileAggregator(q: Double, capacity: Int, seed: Long)
      extends Aggregator[java.lang.Double, (Long, Vector[(Long, Double)], Long), java.lang.Double] {
    require(q > 0 && q <= 1, s"quantile fraction out of (0,1]: $q")
    require(capacity > 0, s"capacity must be positive: $capacity")

    // The sample is BOTTOM-K BY RANDOM KEY: every observed value draws a
    // pseudo-random key; the reservoir is the `capacity` smallest-keyed
    // items seen so far. That makes the sample an exactly-uniform
    // k-subset AND the merge trivially order-independent (bottom-k of a
    // union = bottom-k of the two bottom-ks) — the property the first
    // cut of this aggregator (sequential weighted draw between two
    // Algorithm-R reservoirs) measurably lacked: under Spark's
    // accumulate-left merge chain it over-represented late partitions
    // (simulated median of uniform 1..20000 at cap 512 drifted to
    // 13133). Buffers compact lazily at 2·capacity so the exact regime
    // (n ≤ capacity) never sorts and the hot path stays append-only.
    private def next(s: Long): Long = {
      var x = if (s == 0L) 0x9E3779B97F4A7C15L else s
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x
    }

    private def bottomK(s: Vector[(Long, Double)]): Vector[(Long, Double)] =
      if (s.size <= capacity) s else s.sortBy(_._1).take(capacity)

    override def zero: (Long, Vector[(Long, Double)], Long) = (0L, Vector.empty, seed)

    override def reduce(b: (Long, Vector[(Long, Double)], Long),
        v: java.lang.Double): (Long, Vector[(Long, Double)], Long) =
      if (v == null) b
      else {
        val (n, sample, rng) = b
        // mix the value bits into the evolving state: every partition
        // starts from the same seed, so a state-only chain would hand
        // IDENTICAL keys to same-ordinal items of different partitions
        // (bottom-k would then sample by partition position, not
        // uniformly)
        val r = next(rng ^ (java.lang.Double.doubleToLongBits(v.doubleValue)
          * 0x9E3779B97F4A7C15L))
        val s1 = sample :+ (r, v.doubleValue)
        (n + 1, if (s1.size >= 2 * capacity) bottomK(s1) else s1, r)
      }

    override def merge(a: (Long, Vector[(Long, Double)], Long),
        b: (Long, Vector[(Long, Double)], Long)): (Long, Vector[(Long, Double)], Long) = {
      val (na, sa, ra) = a
      val (nb, sb, rb) = b
      if (na == 0) b
      else if (nb == 0) a
      else (na + nb, bottomK(sa ++ sb), ra ^ next(rb))
    }

    override def finish(b: (Long, Vector[(Long, Double)], Long)): java.lang.Double = {
      val sample = bottomK(b._2)
      val m = sample.size
      if (m == 0) null
      else {
        val sorted = sample.map(_._2).sorted
        // exact for dyadic q (0.25/0.5/0.75): q·m is an exact double, so
        // ceil introduces no float hazard (non-dyadic q near an integer
        // boundary would need rational index arithmetic)
        val idx = math.max(math.ceil(q * m).toInt - 1, 0)
        sorted(math.min(idx, m - 1))
      }
    }

    override def bufferEncoder: Encoder[(Long, Vector[(Long, Double)], Long)] =
      Encoders.kryo[(Long, Vector[(Long, Double)], Long)]
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
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
  /** Mergeable Bloom-filter build (Bloom 1970) — the third sketch family
    * next to the HLL rollup and Space-Saving heavy hitters, and the
    * structure the reference engine itself builds for join pre-filtering
    * (its dynamic join filters). Input is a PRE-HASHED bit position
    * (computed by the shared codegen md5_hash64 in the query, so the
    * filter is bit-deterministic and oracle-reproducible); the buffer is
    * the fixed-size bitmap as longs. `reduce` sets a bit, `merge` ORs —
    * both commutative/associative/idempotent, so the bitmap is EXACT
    * under any partitioning, re-aggregation, or duplicate delivery (the
    * strongest mergeability class of the three sketches: no error term
    * at all on the build side; the approximation lives only in lookup
    * false positives). */
  class BloomAggregator(bits: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(bits % 64 == 0, "bitmap width must be whole longs")

    override def zero: Array[Long] = new Array[Long](bits / 64)

    override def reduce(b: Array[Long], pos: Long): Array[Long] = {
      require(pos >= 0 && pos < bits.toLong,
        s"bloom bit position $pos outside [0, $bits) — caller must hash non-negative % $bits")
      val p = pos.toInt
      b((p >>> 6)) |= (1L << (p & 63))
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Long] = b

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Mergeable Count-Min sketch (Cormode & Muthukrishnan 2005) — the
    * counting sibling of [[BloomAggregator]]: d hash rows × w buckets of
    * counters; `reduce` increments the row-major position (pre-hashed in
    * the query by the shared md5_hash64, like Bloom), `merge` adds
    * element-wise — a commutative monoid, so the sketch is EXACT under
    * any partitioning and re-aggregation order. A point query reads the
    * MIN of a key's d counters: never an underestimate (every counter
    * counts the key plus its collisions), which is the bound the spec
    * and the oracle pin. */
  class CountMinAggregator(rows: Int, width: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](rows * width)
    override def reduce(b: Array[Long], pos: Long): Array[Long] = {
      require(pos >= 0 && pos < (rows.toLong * width),
        s"cms position $pos outside [0, ${rows * width}) — caller must hash non-negative % width per row")
      b(pos.toInt) += 1L; b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

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
