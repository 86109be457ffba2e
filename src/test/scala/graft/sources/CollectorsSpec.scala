package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Result-collector surface (reference
  * `physical_materialized_collector.cpp` / `physical_batch_collector.cpp`
  * analogs): the three surfaces must agree on content and order, and the
  * batched surface must page with the requested shape. */
class CollectorsSpec extends SparkSpec {

  private def ordered = graft.Tables.t(spark, sf(), "orders")
    .orderBy(col("o_orderkey")).select(col("o_orderkey"))

  test("materialized, streaming, and batched agree on content and order") {
    val df = ordered
    val mat = Collectors.materialized(df).map(_.getLong(0)).toSeq
    val str = Collectors.streaming(df).map(_.getLong(0)).toSeq
    val bat = Collectors.batched(df, 7).flatMap(_.map(_.getLong(0))).toSeq
    assert(mat.nonEmpty && mat == str && str == bat)
    assert(mat == mat.sorted)
  }

  test("batched pages with the requested batch size") {
    val sizes = Collectors.batched(ordered.limit(25), 10).map(_.size).toSeq
    assert(sizes == Seq(10, 10, 5))
  }

  test("batch size must be positive") {
    intercept[IllegalArgumentException](Collectors.batched(ordered, 0))
  }
}
