package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Domain-mixture rebalancing — the sampling stage a training-data
  * pipeline runs after curation: the raw corpus over-represents some
  * sources (web crawl) and under-represents others (books, code), so
  * documents are down-sampled per source to hit a target mixture before
  * tokenization. Two published policies:
  *
  *   - uniform cap (`mix_domain_uniform`): every source down-sampled to
  *     ~the smallest source's count — the "equal share" mixture;
  *   - temperature sampling (`mix_temperature`): keep rate
  *     `(n_min / n_s)^(1-α)` with α = 0.5, the multilingual-corpus
  *     rebalancing rule of Conneau & Lample (XLM, 2019) / mT5 — α = 1
  *     keeps everything, α = 0 is the uniform cap, between interpolates.
  *
  * Determinism is the whole design: the keep decision is
  * `hash64(seed, doc_id) % 1e6 < rate_ppm`, with `rate_ppm` computed in
  * integer arithmetic (uniform: `n_min * 1e6 DIV n_s`) or via
  * correctly-rounded double ops with NO cross-source accumulation
  * (temperature: one division, one sqrt, one multiply, one floor — each
  * IEEE-correctly-rounded, so both engines and any cluster size produce
  * the identical sample). A policy normalizing by `Σ_s w_s` would sum
  * doubles in engine-specific order and flip boundary documents; the
  * per-source-only form avoids that class entirely.
  *
  * Scale posture: pass 1 aggregates to |sources| rows (a metadata-sized
  * per-source count — on a cluster this is the only global exchange and
  * it carries ONE row per source); pass 2 is a single corpus scan with
  * the rate table broadcast back, the keep predicate evaluated in the
  * scan's codegen stage, and a map-side-combining per-source count. No
  * corpus-sized shuffle anywhere.
  */
object Mixture {

  private val Ppm = 1000000L

  /** hash64(seed, doc_id) % 1e6 — non-negative (the md5-derived hash is
    * 60-bit positive), so plain % agrees across engines. */
  private def u(seed: Int): Column =
    Dedup.hash64(seed, col("doc_id").cast("string")) % Ppm

  private def uSql(seed: Int): String =
    s"${Dedup.hash64Sql(seed.toString, "CAST(doc_id AS VARCHAR)")} % $Ppm"

  /** Shared two-pass frame: per-source counts + global min → rate_ppm
    * (policy-supplied) → deterministic keep → per-source audit summary
    * (n_total, rate_ppm, n_kept, achieved keep fraction). */
  private def mix(s: SparkSession, dir: String, seed: Int,
      ratePpm: Column): DataFrame = {
    val docs = Tables.t(s, dir, "documents")
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("n_total")).as("n_min"))))
      .select(col("source"), col("n_total"), ratePpm.as("rate_ppm"))
    docs.select(col("source"), u(seed).as("u"))
      .join(broadcast(rates), Seq("source"))
      .groupBy(col("source"), col("n_total"), col("rate_ppm"))
      .agg(sum(when(col("u") < col("rate_ppm"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("source"), col("n_total"), col("rate_ppm"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_total")).as("kept_frac"))
  }

  private def mixSql(seed: Int, ratePpmSql: String): String =
    s"""WITH counts AS (
       |  SELECT source, count(*) AS n_total FROM documents GROUP BY source),
       |rates AS (
       |  SELECT source, n_total, $ratePpmSql AS rate_ppm
       |  FROM counts, (SELECT min(n_total) AS n_min FROM counts) m),
       |hashed AS (
       |  SELECT source, ${uSql(seed)} AS u FROM documents)
       |SELECT source, n_total, rate_ppm,
       |  CAST(sum(CASE WHEN u < rate_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN u < rate_ppm THEN 1 ELSE 0 END) AS DOUBLE)
       |    / n_total AS kept_frac
       |FROM hashed JOIN rates USING (source)
       |GROUP BY source, n_total, rate_ppm""".stripMargin

  /** Uniform cap: every source down-sampled to ~n_min documents.
    * `rate_ppm = n_min * 1e6 DIV n_total` — pure integer arithmetic
    * (n_min ≤ 2^33 before the product leaves BIGINT range). */
  def mixDomainUniform(s: SparkSession, dir: String): DataFrame =
    mix(s, dir, seed = 7, expr(s"n_min * $Ppm DIV n_total"))

  val mixDomainUniformSql: String =
    mixSql(seed = 7, s"(n_min * $Ppm) // n_total")

  /** Temperature sampling, α = 0.5: `rate_ppm =
    * floor(sqrt(n_min / n_total) * 1e6)` — division, sqrt, multiply,
    * floor are each correctly rounded over doubles, so the ppm threshold
    * is bit-identical on both engines. */
  def mixTemperature(s: SparkSession, dir: String): DataFrame =
    mix(s, dir, seed = 11,
      floor(sqrt(col("n_min").cast("double") / col("n_total")) * Ppm)
        .cast("long"))

  val mixTemperatureSql: String =
    mixSql(seed = 11,
      s"CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_total) * $Ppm) AS BIGINT)")

  /** The kept documents themselves (the pipeline's actual output; the
    * audit entries above are what the oracle pins). */
  def sampleUniform(s: SparkSession, dir: String, seed: Int = 7): DataFrame = {
    val docs = Tables.t(s, dir, "documents")
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("n_total")).as("n_min"))))
      .select(col("source"),
        expr(s"n_min * $Ppm DIV n_total").as("rate_ppm"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(u(seed) < col("rate_ppm"))
      .drop("rate_ppm")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mix_domain_uniform" -> (mixDomainUniform _),
    "mix_temperature" -> (mixTemperature _))

  val oracle: Map[String, String] = Map(
    "mix_domain_uniform" -> mixDomainUniformSql,
    "mix_temperature" -> mixTemperatureSql)
}
