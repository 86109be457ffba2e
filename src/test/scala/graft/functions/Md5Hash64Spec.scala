package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Md5Hash64Spec extends SparkSpec {
  import spark.implicits._

  test("codegen hash equals the composed md5/conv expression") {
    val strs = Seq("", "a", "hello world", "héllo ünïcode ✓", "0:edge", "x" * 500) ++
      (1 to 50).map(i => s"doc $i content ${i * 37}")
    val df = strs.toDF("s")
    for (seed <- Seq(0, 1, 31, 42)) {
      val both = df.select(
        GraftFunctions.md5_hash64(seed, $"s").as("fast"),
        conv(substring(md5(concat(lit(seed), lit(":"), $"s").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("composed"))
      assert(both.filter($"fast" =!= $"composed").count() == 0, s"seed=$seed")
    }
  }

  test("SQL registration: md5_hash64(seed, v) with literal seed") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT md5_hash64(42, 'abc') AS h, md5_hash64(0, 123) AS hn").head
    assert(r.getLong(0) ==
      Md5Hash64.hash(42, org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
    assert(r.getLong(1) ==
      Md5Hash64.hash(0, org.apache.spark.unsafe.types.UTF8String.fromString("123")))
  }

  test("null input yields null; interpreted path matches codegen") {
    val df = Seq(Some("abc"), None).toDF("s")
    val r = df.select(GraftFunctions.md5_hash64(7, $"s").as("h")).collect()
    assert(r.exists(_.isNullAt(0)) && r.exists(!_.isNullAt(0)))
    // interpreted eval (no codegen) through a literal fold context
    val lit1 = Md5Hash64.hash(7, org.apache.spark.unsafe.types.UTF8String.fromString("abc"))
    assert(r.find(!_.isNullAt(0)).get.getLong(0) == lit1)
  }
}
