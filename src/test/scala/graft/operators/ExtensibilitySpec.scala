package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Extensibility + utility-operator surface (SURVEY.md §2.9, §2.11):
  * scalar UDF registration (reference `Connection::CreateScalarFunction`),
  * typed UDAF (`CreateAggregateFunction`), table-function UDTF via
  * Dataset.flatMap (`physical_tableinout_function.cpp`), prepared/
  * parameterized statements (`physical_prepare.cpp`), and materialized
  * intermediate reuse (`physical_column_data_scan.cpp` — CTE/cache scan).
  */
class ExtensibilitySpec extends SparkSpec {
  import spark.implicits._

  test("scalar UDF registers and runs in SQL and DataFrame API") {
    val tripled = udf((x: Long) => x * 3)
    spark.udf.register("tripled", tripled)
    graft.Tables.registerAll(spark, sf())
    val viaSql = spark.sql("SELECT tripled(r_regionkey) AS t FROM region ORDER BY t")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == Seq(0L, 3L, 6L, 9L, 12L))
    val viaDf = graft.Tables.t(spark, sf(), "region")
      .select(tripled($"r_regionkey").as("t")).orderBy($"t")
      .collect().map(_.getLong(0)).toSeq
    assert(viaDf == viaSql)
  }

  test("typed Aggregator registers as a UDAF") {
    val ent = udaf(new graft.functions.GraftAggregators.EntropyAggregator)
    spark.udf.register("my_entropy", ent)
    graft.Tables.registerAll(spark, sf())
    val e = spark.sql("SELECT my_entropy(l_returnflag) AS e FROM lineitem")
      .head.getDouble(0)
    assert(e > 1.0 && e < 1.6) // ~log2(3) for 3 roughly-equal flags
  }

  test("UDTF via Dataset.flatMap: one row in, n rows out") {
    val docs = graft.Tables.t(spark, sf(), "documents").limit(10)
      .select($"doc_id", $"text").as[(Long, String)]
    val exploded = docs.flatMap { case (id, text) =>
      text.split(" ").zipWithIndex.map { case (w, i) => (id, i, w) }
    }.toDF("doc_id", "pos", "word")
    val viaGenerator = graft.Tables.t(spark, sf(), "documents").limit(10)
      .select($"doc_id", posexplode(split($"text", " ")))
    assert(exploded.count() == viaGenerator.count())
  }

  test("parameterized SQL (prepared-statement analog)") {
    graft.Tables.registerAll(spark, sf())
    val n1 = spark.sql(
      "SELECT count(*) AS n FROM orders WHERE o_totalprice > :threshold",
      Map("threshold" -> 300000)).head.getLong(0)
    val n2 = spark.sql(
      "SELECT count(*) AS n FROM orders WHERE o_totalprice > :threshold",
      Map("threshold" -> 100000)).head.getLong(0)
    assert(n1 < n2)
  }

  test("cached intermediate is scanned, not recomputed (CTE-scan analog)") {
    val base = graft.Tables.t(spark, sf(), "lineitem")
      .groupBy($"l_returnflag").agg(sum($"l_quantity").as("q"))
      .cache()
    base.count() // materialize
    val plan = base.filter($"q" > 0).queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"))
    base.unpersist()
  }

  test("limit-percent recipe") {
    val df = graft.Tables.t(spark, sf(), "orders")
    val total = df.count()
    val pct10 = df.orderBy($"o_orderkey").limit((total * 10 / 100).toInt)
    assert(pct10.count() == total / 10)
  }
}
