package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling operators (reference
  * `src/execution/operator/helper/physical_reservoir_sample.cpp`,
  * `physical_streaming_sample.cpp`): Bernoulli sampling is Spark's
  * `df.sample`; exact-size reservoir sampling distributes as
  * rank-by-random + top-k (TakeOrdered — no global sort materialization),
  * which is the classic distributed reservoir equivalent: every row draws
  * a seeded uniform key, the k smallest win.
  */
object Sampling {

  /** Exact-size uniform sample without replacement, deterministic per
    * seed. Plans as TakeOrderedAndProject — k rows cross the wire per
    * partition, never the full frame. */
  def reservoir(df: DataFrame, k: Int, seed: Long = 42L): DataFrame =
    df.withColumn("_r", rand(seed))
      .orderBy(col("_r"))
      .limit(k)
      .drop("_r")

  /** Bernoulli fraction sample (streaming sample analog). */
  def bernoulli(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)
}
