package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Analogs for the reference's OTHER OLAP benchmark suites beyond
  * TPC-H/TPC-DS/JOB — the db-benchmark (h2oai) grouping battery and
  * ClickBench (reference `benchmark/h2oai/group/queries/` and
  * `benchmark/clickbench/queries/`, 10 + 43 SQL files). Most shapes are
  * already covered by the `agg_*`/`win_*`/`shape_*` families (sums by
  * key at varying cardinality, median+sd per group, top-2 per group via
  * row_number, corr² per group, uniq counts, ordered LIMIT) — these two
  * entries pin the shapes those families DON'T hit. */
object OlapSuites {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** h2oai groupby q10 (reference `benchmark/h2oai/group/queries/q10.sql`:
    * `GROUP BY id1, …, id6` with sum + count): the NEAR-ROW-CARDINALITY
    * grouping stress — six keys whose combination is the row identity, so
    * the aggregate's hash table holds ~|rows| groups (60 k at sf0.01) and
    * map-side partial aggregation reduces nothing. Scale posture: one
    * hash-aggregate exchange on all six keys; the reduction happening
    * nowhere is the POINT (the question measures grouping machinery, not
    * data reduction), and Spark's two-phase aggregate degrades gracefully
    * to a pure shuffle-and-finalize here. */
  def h2oGroupbySix(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_extendedprice"))).cast("double").as("v3"),
        count(lit(1)).as("cnt"))

  val h2oGroupbySixSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |       l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS v3,
      |       count(*) AS cnt
      |FROM lineitem
      |GROUP BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |         l_returnflag, l_linestatus""".stripMargin

  /** ClickBench's domain-extraction top-N family (reference
    * `benchmark/clickbench/queries/` — e.g. "GROUP BY domain ORDER BY
    * uniq users DESC LIMIT 10" with the domain REGEXP-extracted from the
    * URL inside the grouping key): a computed string key feeding a
    * count-distinct aggregate feeding an ordered LIMIT with a total-order
    * tie-break. The regexp runs once per row inside the scan's codegen
    * stage; the distinct count shuffles on the computed key. */
  def cbDomainTopn(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .select(
        (regexp_extract(col("source"), "src([0-9]+)", 1).cast("int") % 5)
          .as("bucket"),
        col("lang"), col("n_chars"))
      .groupBy(col("bucket"))
      .agg(countDistinct(col("lang")).as("u"),
        count(lit(1)).as("n"),
        sum(col("n_chars")).as("chars"))
      .orderBy(col("u").desc, col("n").desc, col("bucket").asc)
      .limit(3)

  val cbDomainTopnSql: String =
    """SELECT CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INT) % 5 AS bucket,
      |       count(DISTINCT lang) AS u, count(*) AS n,
      |       CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM documents
      |GROUP BY 1
      |ORDER BY u DESC, n DESC, bucket ASC
      |LIMIT 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h2o_groupby_six" -> (h2oGroupbySix _),
    "cb_domain_topn" -> (cbDomainTopn _))

  val oracle: Map[String, String] = Map(
    "h2o_groupby_six" -> h2oGroupbySixSql,
    "cb_domain_topn" -> cbDomainTopnSql)
}
